from .cp import CPPrecond, CPState, FactorApply, make_preconditioner, assemble_kp
from .trisolve import BlockTriFactor, build_block_tri, build_block_tri_upper, block_tri_solve
