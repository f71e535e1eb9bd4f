from oryon_tpu.parallel.mesh import (make_mesh, serving_mesh, shard_batch,
                                     replicate)
