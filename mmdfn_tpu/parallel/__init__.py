from mmdfn_tpu.parallel.graph_parallel import (sharded_gcnii_stack,
                                               sharded_spmm,
                                               sharded_spmm_batched)

__all__ = ["sharded_spmm", "sharded_spmm_batched", "sharded_gcnii_stack"]
