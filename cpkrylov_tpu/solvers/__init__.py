from .common import KrylovResult, sym_givens
from .cpcg import cpcg
from .cpcglanczos import cpcglanczos
from .cpminres import cpminres
from .cpsymmlq import cpsymmlq
from .cpgmres import cpgmres
from .cpdqgmres import cpdqgmres
