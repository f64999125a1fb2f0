from mmdfn_tpu.runtime.mesh import (DATA_AXIS, MODEL_AXIS, batch_sharding,
                                    make_mesh, replicate, replicated,
                                    shard_batch)

__all__ = ["DATA_AXIS", "MODEL_AXIS", "make_mesh", "batch_sharding",
           "replicated", "replicate", "shard_batch"]
