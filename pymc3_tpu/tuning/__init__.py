from .starting import find_MAP
from .scaling import (
    find_hessian, find_hessian_diag, fixed_hessian, guess_scaling, trace_cov,
)

__all__ = ["find_MAP", "find_hessian", "find_hessian_diag", "fixed_hessian",
           "guess_scaling", "trace_cov"]
