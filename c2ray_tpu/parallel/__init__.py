from .domain import (domain_evolve3d, group_sources_balanced,
                     group_sources_by_slab, make_domain_iteration,
                     max_domain_radius, shard_state_slabs)
from .sharding import (ParallelConfig, make_parallel_iteration,
                       pad_sources, parallel_evolve3d)

__all__ = ["ParallelConfig", "make_parallel_iteration", "pad_sources",
           "parallel_evolve3d", "domain_evolve3d",
           "group_sources_balanced", "group_sources_by_slab",
           "make_domain_iteration", "max_domain_radius",
           "shard_state_slabs"]
