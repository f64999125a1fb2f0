from mmdfn_tpu.serve.streaming import StreamingSession

__all__ = ["StreamingSession"]
