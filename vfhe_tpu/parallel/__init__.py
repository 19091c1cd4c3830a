from .mesh import (make_mesh, make_host_mesh, init_multihost, dp_sharding,
                   col_sharding, replicated)
from .batched import make_step_core, make_batched_step_core, sharded_ntt
from .dist_ntt import make_dist_ntt

__all__ = ["make_mesh", "make_host_mesh", "init_multihost", "dp_sharding",
           "col_sharding", "replicated", "make_step_core",
           "make_batched_step_core", "sharded_ntt", "make_dist_ntt"]
