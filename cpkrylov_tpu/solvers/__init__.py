from .common import KrylovResult, SolverOptions, sym_givens
from .cpminres import cpminres
