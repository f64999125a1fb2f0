from mmdfn_tpu.parallel.graph_parallel import (sharded_gcnii_stack,
                                               sharded_spmm)

__all__ = ["sharded_spmm", "sharded_gcnii_stack"]
