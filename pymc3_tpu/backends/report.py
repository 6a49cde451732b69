"""Sampler report & convergence checks (cf. ``pymc3/backends/report.py``).

``SamplerWarning``/``WarningType`` (``report.py:26-42``) and ``SamplerReport``
(``report.py:54``) with tiered R-hat / ESS convergence checks
(``report.py:101-168``). The reference delegates rhat/ess to ArviZ; this
build computes them natively (``pymc3_tpu/stats``) — on-device when traces
are device arrays.
"""
from __future__ import annotations

import enum
import logging
from collections import namedtuple
from typing import Optional

import numpy as np

logger = logging.getLogger("pymc3_tpu")

__all__ = ["SamplerWarning", "WarningType", "SamplerReport", "merge_reports"]


@enum.unique
class WarningType(enum.Enum):
    # For HMC and NUTS
    DIVERGENCE = 1
    TUNING_DIVERGENCE = 2
    DIVERGENCES = 3
    TREEDEPTH = 4
    # Problematic sampler parameters
    BAD_PARAMS = 5
    # Indications that chains did not converge, e.g. Rhat
    CONVERGENCE = 6
    BAD_ACCEPTANCE = 7
    BAD_ENERGY = 8


SamplerWarning = namedtuple(
    "SamplerWarning",
    "kind, message, level, step, exec_info, extra")
SamplerWarning.__new__.__defaults__ = (None, None, None)


_LEVELS = {
    "info": logging.INFO,
    "error": logging.ERROR,
    "warn": logging.WARNING,
    "debug": logging.DEBUG,
    "critical": logging.CRITICAL,
}


class SamplerReport:
    """Bundle warnings, convergence stats and metadata of a sampling run
    (cf. ``report.py:54``)."""

    def __init__(self):
        self._chain_warnings = {}
        self._global_warnings = []
        self._ess = None
        self._rhat = None
        self._n_tune = None
        self._n_draws = None
        self._t_sampling = None

    @property
    def _warnings(self):
        chains = sum(self._chain_warnings.values(), [])
        return chains + self._global_warnings

    @property
    def ok(self):
        """Whether the automatic convergence checks found serious problems."""
        return all(_LEVELS[warn.level] < _LEVELS["warn"]
                   for warn in self._warnings)

    @property
    def n_tune(self) -> Optional[int]:
        """Number of tune iterations - not necessarily kept in trace!"""
        return self._n_tune

    @property
    def n_draws(self) -> Optional[int]:
        return self._n_draws

    @property
    def t_sampling(self) -> Optional[float]:
        """Number of seconds that the sampling procedure took."""
        return self._t_sampling

    def raise_ok(self, level="error"):
        errors = [warn for warn in self._warnings
                  if _LEVELS[warn.level] >= _LEVELS[level]]
        if errors:
            raise ValueError(f"Serious convergence issues during sampling. "
                             f"{errors}")

    def _run_convergence_checks(self, trace, model):
        """cf. ``report.py:101-168`` — R-hat thresholds 1.05/1.2/1.4 and
        ESS thresholds vs chain count."""
        if trace.nchains == 1:
            msg = ("Only one chain was sampled, this makes it impossible to "
                   "run some convergence checks")
            warn = SamplerWarning(WarningType.BAD_PARAMS, msg, "info",
                                  None, None, None)
            self._add_warnings([warn])
            return

        from ..stats import ess as _ess, rhat as _rhat
        valid_name = [rv.name for rv in model.free_RVs + model.deterministics]
        varnames = []
        for rv in model.free_RVs:
            rv_name = rv.name
            if rv_name in trace.varnames:
                varnames.append(rv_name)
            orig = getattr(rv, "orig_name", rv_name)
            if orig != rv_name and orig in trace.varnames:
                varnames.append(orig)

        self._ess = ess_vals = {v: _ess(trace, var_names=[v])[v]
                                for v in varnames}
        self._rhat = rhat_vals = {v: _rhat(trace, var_names=[v])[v]
                                  for v in varnames}

        warnings_ = []
        rhat_max = max((np.max(x) for x in rhat_vals.values()), default=0)
        if rhat_max > 1.4:
            msg = ("The rhat statistic is larger than 1.4 for some "
                   "parameters. The sampler did not converge.")
            warnings_.append(SamplerWarning(
                WarningType.CONVERGENCE, msg, "error", None, None, rhat_vals))
        elif rhat_max > 1.2:
            msg = ("The rhat statistic is larger than 1.2 for some "
                   "parameters.")
            warnings_.append(SamplerWarning(
                WarningType.CONVERGENCE, msg, "warn", None, None, rhat_vals))
        elif rhat_max > 1.05:
            msg = ("The rhat statistic is larger than 1.05 for some "
                   "parameters. This indicates slight problems during "
                   "sampling.")
            warnings_.append(SamplerWarning(
                WarningType.CONVERGENCE, msg, "info", None, None, rhat_vals))

        eff_min = min((np.min(x) for x in ess_vals.values()), default=np.inf)
        n_samples = len(trace) * trace.nchains
        if eff_min < 200 and n_samples >= 500:
            msg = ("The estimated number of effective samples is smaller than "
                   "200 for some parameters.")
            warnings_.append(SamplerWarning(
                WarningType.CONVERGENCE, msg, "error", None, None, ess_vals))
        elif eff_min / n_samples < 0.1:
            msg = "The number of effective samples is smaller than 10% for some parameters."
            warnings_.append(SamplerWarning(
                WarningType.CONVERGENCE, msg, "warn", None, None, ess_vals))
        elif eff_min / n_samples < 0.25:
            msg = "The number of effective samples is smaller than 25% for some parameters."
            warnings_.append(SamplerWarning(
                WarningType.CONVERGENCE, msg, "info", None, None, ess_vals))

        self._add_warnings(warnings_)

    def _add_warnings(self, warnings, chain=None):
        if chain is None:
            warn_list = self._global_warnings
        else:
            warn_list = self._chain_warnings.setdefault(chain, [])
        warn_list.extend(warnings)

    def _log_summary(self):
        def log_warning(warn):
            level = _LEVELS[warn.level]
            logger.log(level, warn.message)

        for chain, warns in self._chain_warnings.items():
            for warn in warns:
                log_warning(warn)
        for warn in self._global_warnings:
            log_warning(warn)

    def _slice(self, start, stop, step):
        report = SamplerReport()

        def filter_warns(warnings):
            out = []
            for warn in warnings:
                if warn.step is None:
                    out.append(warn)
                elif start <= warn.step < stop and \
                        (warn.step - start) % step == 0:
                    out.append(warn._replace(step=warn.step - start))
            return out

        report._add_warnings(filter_warns(self._global_warnings))
        for chain in self._chain_warnings:
            report._add_warnings(filter_warns(self._chain_warnings[chain]),
                                 chain)
        return report


def merge_reports(reports):
    """cf. ``report.py:211``."""
    report = SamplerReport()
    for rep in reports:
        report._add_warnings(rep._global_warnings)
        for chain in rep._chain_warnings:
            report._add_warnings(rep._chain_warnings[chain], chain)
    return report
