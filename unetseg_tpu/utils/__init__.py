from unetseg_tpu.utils.profiling import DeviceTimer, annotate, memory_stats, trace  # noqa: F401
