from .partition import PartitionedBlocks, partition_blocks, shard_vector, unshard_vector
from .cpminres import dist_cpminres
