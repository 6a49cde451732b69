"""MCMC step methods (cf. ``pymc3/step_methods/__init__.py``).

Every stepper is built around a *functional kernel*:

    ``step(key, q, state, tctx) -> (q_new, state_new, stats)``

where ``q`` is the full flat unconstrained vector, ``state`` is a pytree of
jnp arrays, and ``tctx`` carries the tuning step index/flag. Kernels are pure
and shape-static, so the driver can ``lax.scan`` them over draws, ``vmap``
them over chains, and ``shard_map`` the chain axis over a device mesh —
replacing the reference's per-chain OS processes
(``pymc3/parallel_sampling.py``).
"""
from .arraystep import ArrayStep, ArrayStepShared, BlockedStep, Competence, metrop_select
from .compound import CompoundStep
from .hmc import NUTS, HamiltonianMC
from .metropolis import (
    Metropolis,
    BinaryMetropolis,
    BinaryGibbsMetropolis,
    CategoricalGibbsMetropolis,
    DEMetropolis,
    DEMetropolisZ,
    NormalProposal,
    UniformProposal,
    CauchyProposal,
    LaplaceProposal,
    PoissonProposal,
    MultivariateNormalProposal,
)
from .slicer import Slice
from .elliptical_slice import EllipticalSlice
from .gibbs import ElemwiseCategorical

__all__ = [
    "NUTS", "HamiltonianMC", "Metropolis", "BinaryMetropolis",
    "BinaryGibbsMetropolis", "CategoricalGibbsMetropolis", "DEMetropolis",
    "DEMetropolisZ", "Slice", "EllipticalSlice", "ElemwiseCategorical",
    "CompoundStep", "Competence",
]

STEP_METHODS = (
    NUTS,
    HamiltonianMC,
    Metropolis,
    BinaryMetropolis,
    BinaryGibbsMetropolis,
    Slice,
    CategoricalGibbsMetropolis,
)
