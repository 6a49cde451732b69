"""Shared HMC machinery (cf. ``pymc3/step_methods/hmc/base_hmc.py``).

In this build the momentum draw / state construction / divergence handling
live inside the jitted kernels (``nuts.py`` / ``hmc.py``); this module keeps
the reference's auxiliary types for API parity.
"""
from __future__ import annotations

from collections import namedtuple

from ..arraystep import GradientSharedStep

__all__ = ["BaseHMC", "HMCStepData", "DivergenceInfo"]

HMCStepData = namedtuple("HMCStepData",
                         "end, accept_stat, divergence_info, stats")

DivergenceInfo = namedtuple("DivergenceInfo", "message, exec_info, state")


class BaseHMC(GradientSharedStep):
    """Superclass of NUTS and HamiltonianMC (cf. ``base_hmc.py:36``)."""
