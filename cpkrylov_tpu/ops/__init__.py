from .dia import (DIA, DIASpill, pack_dia, pack_dia_spill, pack_sym_dia)
from .formats import (BSR, CSR, ELL, Diagonal, bsr_from_scipy,
                      csr_from_scipy, csr_to_scipy, ell_from_scipy)
from .spmv import (bsr_matmat, bsr_matvec, csr_matmat, csr_matvec,
                   csr_rmatvec, dia_matmat, dia_matvec, dia_rmatvec,
                   diag_matvec, ell_matmat, ell_matvec, matmat, matvec)
