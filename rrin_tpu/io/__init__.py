"""Host-side video I/O (SURVEY.md §2.1 row 7, §2.2 last row).

OpenCV videoio only — this environment has no ffmpeg binary and no PyAV
(SURVEY.md §7). Decode and encode run on their own threads, feeding the
device pipeline through bounded queues (the TPU-native replacement for the
reference's CUDA-stream overlap)."""

from rrin_tpu.io.video import VideoReader, VideoWriter, probe_video

__all__ = ["VideoReader", "VideoWriter", "probe_video"]
