"""pymc3_tpu — a TPU-native probabilistic programming framework.

A ground-up rebuild of the capabilities of PyMC3 3.8 (the Theano-backed PPL)
on JAX/XLA for TPUs: the model DSL traces to one fused XLA logp+grad program,
MCMC chains are a ``vmap`` batch axis sharded over device meshes, and all hot
loops (NUTS tree building, leapfrog, VI steps, SMC mutation) run as on-device
``lax`` control flow.

Flat ``pm.*`` API surface mirrors ``pymc3/__init__.py:18-50``.
"""

__version__ = "3.8.0.tpu0"

import logging

_log = logging.getLogger("pymc3_tpu")
if not logging.root.handlers:
    _log.setLevel(logging.INFO)
    if len(_log.handlers) == 0:
        handler = logging.StreamHandler()
        _log.addHandler(handler)

from .config import floatX, intX, get_config, set_config
from . import node
from . import math
from .math import (
    logsumexp, logit, invlogit, expand_packed_triangular, probit, invprobit,
)
from .model import (
    Model, modelcontext, Point, Deterministic, Potential, set_data,
    ValueGradFunction, fn, fastfn, FreeRV, ObservedRV, TransformedRV,
)
from .blocking import ArrayOrdering, DictToArrayBijection
from .data import Data, Minibatch, get_data, GeneratorAdapter
from .distributions import *
from .distributions import transforms
from . import distributions
from .exceptions import *
from .memoize import memoize, clear_cache
from .vartypes import *

from . import step_methods
from .step_methods import (
    NUTS, HamiltonianMC, Metropolis, BinaryMetropolis, BinaryGibbsMetropolis,
    CategoricalGibbsMetropolis, DEMetropolis, DEMetropolisZ, Slice,
    EllipticalSlice, ElemwiseCategorical, CompoundStep,
)
from . import backends
from .backends.base import MultiTrace, merge_traces
from .backends.ndarray import NDArray, save_trace, load_trace
from .backends.tracetab import trace_to_dataframe
from .backends.report import SamplerReport, SamplerWarning, WarningType
from .sampling import (
    sample, iter_sample, init_nuts, sample_prior_predictive,
    sample_posterior_predictive, sample_posterior_predictive_w,
    fast_sample_posterior_predictive, stop_tuning, assign_step_methods,
)
from . import stats
from .stats import (
    bfmi, compare, ess, geweke, hpd, loo, mcse, r2_score, rhat, summary, waic,
)
from .tuning import find_MAP, find_hessian
from . import parallel

from . import variational
from .variational import (
    ADVI, ASVGD, NFVI, SVGD, FullRankADVI, Empirical, FullRank, MeanField,
    NormalizingFlow, KLqp, fit, sample_approx,
)
from .smc import sample_smc, SMC

from . import gp
from . import glm
from .glm import GLM, LinearComponent
from . import ode
from .ode import DifferentialEquation
from . import plots
from .plots import (
    traceplot, plot_posterior, forestplot, energyplot, autocorrplot,
    densityplot, pairplot, compareplot, plot_posterior_predictive_glm,
)
from .model_graph import model_to_graphviz
