from .coo import COO
from .ell import ELL, csr_to_ell, spmm_ell, spmv_ell
from .interop import from_bcoo, from_scipy, to_bcoo, to_scipy
from .reorder import apply_perm, bandwidth, permute_symmetric, rcm_permutation
from .csr import CSR, CsrEntry
from .dense import Dense, DenseS
from .elementwise import (
    add,
    add_sparse,
    l2_norm,
    mul_scalar,
    sub,
    sub_sparse,
    sum_elements,
)
from .spgemm import mul_sparse, spgemm, spgemm_bounded, spgemm_dense
from .spmm import mul_dense, mul_vector, spmm, spmm_auto, spmm_to_csr, spmv
from .transpose import transpose

__all__ = [
    "CSR",
    "CsrEntry",
    "COO",
    "ELL",
    "csr_to_ell",
    "spmm_ell",
    "spmv_ell",
    "to_bcoo",
    "from_bcoo",
    "to_scipy",
    "from_scipy",
    "rcm_permutation",
    "permute_symmetric",
    "apply_perm",
    "bandwidth",
    "Dense",
    "DenseS",
    "transpose",
    "add",
    "sub",
    "add_sparse",
    "sub_sparse",
    "mul_scalar",
    "sum_elements",
    "l2_norm",
    "spmm",
    "spmv",
    "spmm_auto",
    "spmm_to_csr",
    "mul_dense",
    "mul_vector",
    "spgemm",
    "spgemm_dense",
    "spgemm_bounded",
    "mul_sparse",
]
