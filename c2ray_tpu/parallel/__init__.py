from .sharding import (ParallelConfig, make_parallel_iteration,
                       pad_sources, parallel_evolve3d)

__all__ = ["ParallelConfig", "make_parallel_iteration", "pad_sources",
           "parallel_evolve3d"]
