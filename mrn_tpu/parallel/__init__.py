from mrn_tpu.parallel.mesh import (get_mesh, set_data_parallel, shard_batch,
                                   replicate)

__all__ = ["get_mesh", "set_data_parallel", "shard_batch", "replicate"]
