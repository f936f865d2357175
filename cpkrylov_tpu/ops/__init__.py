from .formats import CSR, ELL, Diagonal, csr_from_scipy, ell_from_scipy, csr_to_scipy
from .spmv import csr_matvec, csr_rmatvec, ell_matvec, diag_matvec, matvec
