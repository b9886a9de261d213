from unetseg_tpu.track.tracker import CellTrack, Tracker, track_sequence_masks  # noqa: F401
from unetseg_tpu.track.ctc_io import read_track_file, write_res_track  # noqa: F401
from unetseg_tpu.track.iou import pairwise_iou  # noqa: F401
