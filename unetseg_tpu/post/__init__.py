from unetseg_tpu.post.cc import get_instance_masks, label_components, remove_small  # noqa: F401
