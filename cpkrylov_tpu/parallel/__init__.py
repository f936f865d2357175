from .partition import PartitionedBlocks, partition_blocks, shard_vector, unshard_vector
from .cpminres import dist_cpminres
from .halo import HaloBlock, plan_halo_block, halo_extend, halo_matvec
from .solve import dist_solve, precond_spec
from .mixed import build_dist_precond, dist_solve_mixed
from .schur import SchurFactor, plan_schur_precond
from . import bootstrap
