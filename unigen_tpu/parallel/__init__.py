from .mesh import make_mesh, MeshAxes  # noqa: F401
from .partition import (partition_unigen, partition_batch, shard_params,  # noqa: F401
                        partition_magvit, partition_siglip)
