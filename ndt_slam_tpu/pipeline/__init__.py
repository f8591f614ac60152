from ndt_slam_tpu.pipeline.frontend import FrontEnd, FrameResult

__all__ = ["FrontEnd", "FrameResult"]
