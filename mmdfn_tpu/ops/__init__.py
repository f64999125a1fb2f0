from mmdfn_tpu.ops.pallas_gcnii import gcnii_stack_fused

__all__ = ["gcnii_stack_fused"]
