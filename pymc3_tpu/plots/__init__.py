"""Plotting (cf. ``pymc3/plots/__init__.py``).

The reference delegates to ArviZ (``plots/__init__.py:40-46``); ArviZ is not
available in this image, so the core plots (traceplot, plot_posterior,
forestplot, energyplot, autocorrplot, densityplot, pairplot) are implemented
natively on matplotlib with the same call signatures.
"""
from __future__ import annotations

import functools
import warnings

import numpy as np

from ..stats import hpd as _hpd, ess as _ess, rhat as _rhat
from .posteriorplot import plot_posterior_predictive_glm

__all__ = [
    "traceplot", "plot_posterior", "forestplot", "energyplot",
    "autocorrplot", "densityplot", "pairplot", "compareplot", "kdeplot",
    "plot_posterior_predictive_glm",
]


def _get_axes(n, figsize=None, ncols=2):
    import matplotlib.pyplot as plt
    nrows = n
    fig, axes = plt.subplots(nrows, ncols,
                             figsize=figsize or (12, 2.2 * nrows),
                             squeeze=False)
    return fig, axes


def _extract(trace, var_names=None, include_transformed=False):
    if var_names is None:
        var_names = [v for v in trace.varnames
                     if include_transformed or not v.endswith("__")]
    out = {}
    for name in var_names:
        chains = [trace.get_values(name, chains=[c]) for c in trace.chains]
        out[name] = np.stack(chains)  # (chains, draws, ...)
    return out


def _flat_iter(data):
    """Yield (label, (chains, draws) array) per scalar element."""
    for name, ary in data.items():
        c, n = ary.shape[:2]
        flat = ary.reshape(c, n, -1)
        for i in range(flat.shape[2]):
            if flat.shape[2] == 1:
                yield name, flat[:, :, 0]
            else:
                idx = np.unravel_index(i, ary.shape[2:])
                yield f"{name}[{','.join(map(str, idx))}]", flat[:, :, i]


def _kde(samples, grid_n=200):
    from scipy.stats import gaussian_kde
    samples = np.asarray(samples).ravel()
    if samples.std() == 0:
        x = np.array([samples[0]])
        return x, np.array([1.0])
    kde = gaussian_kde(samples)
    x = np.linspace(samples.min(), samples.max(), grid_n)
    return x, kde(x)


def traceplot(trace, var_names=None, figsize=None, combined=False,
              **kwargs):
    """Marginal densities + sample traces per variable
    (cf. ArviZ ``plot_trace``)."""
    data = _extract(trace, var_names)
    items = list(_flat_iter(data))
    fig, axes = _get_axes(len(items), figsize)
    for i, (label, ary) in enumerate(items):
        ax_kde, ax_trace = axes[i]
        for c in range(ary.shape[0]):
            if _is_discrete(ary):
                vals, counts = np.unique(ary[c], return_counts=True)
                ax_kde.plot(vals, counts / counts.sum(), drawstyle="steps")
            else:
                x, y = _kde(ary[c])
                ax_kde.plot(x, y, alpha=0.8)
            ax_trace.plot(ary[c], alpha=0.6, lw=0.5)
        ax_kde.set_title(label)
        ax_trace.set_title(label)
    fig.tight_layout()
    return axes


def _is_discrete(ary):
    return np.allclose(ary, np.round(ary)) and len(np.unique(ary)) < 30


def plot_posterior(trace, var_names=None, figsize=None,
                   credible_interval=0.94, ref_val=None, **kwargs):
    """Posterior densities with HPD annotation (cf. ArviZ
    ``plot_posterior``)."""
    import matplotlib.pyplot as plt
    data = _extract(trace, var_names)
    items = list(_flat_iter(data))
    n = len(items)
    ncols = min(n, 3)
    nrows = int(np.ceil(n / ncols))
    fig, axes = plt.subplots(nrows, ncols,
                             figsize=figsize or (4 * ncols, 2.6 * nrows),
                             squeeze=False)
    for i, (label, ary) in enumerate(items):
        ax = axes[i // ncols][i % ncols]
        samples = ary.ravel()
        x, y = _kde(samples)
        ax.plot(x, y)
        lo, hi = _hpd(samples, alpha=1 - credible_interval)
        ax.hlines(0, lo, hi, lw=4)
        ax.text((lo + hi) / 2, 0.05 * y.max(),
                f"{100 * credible_interval:.0f}% HPD", ha="center")
        ax.set_title(f"{label}\nmean={samples.mean():.3g}")
        if ref_val is not None:
            ax.axvline(ref_val, color="r", ls="--")
        ax.set_yticks([])
    fig.tight_layout()
    return axes


def forestplot(trace, var_names=None, credible_interval=0.94, figsize=None,
               r_hat=False, **kwargs):
    """Interval forest plot (cf. ArviZ ``plot_forest``)."""
    import matplotlib.pyplot as plt
    data = _extract(trace, var_names)
    items = list(_flat_iter(data))
    fig, ax = plt.subplots(figsize=figsize or (6, 0.5 * len(items) + 1))
    labels = []
    for i, (label, ary) in enumerate(items):
        samples = ary.ravel()
        lo, hi = _hpd(samples, alpha=1 - credible_interval)
        m = samples.mean()
        y = len(items) - i
        ax.plot([lo, hi], [y, y], "b-", lw=2)
        ax.plot(m, y, "bo")
        labels.append(label)
    ax.set_yticks(range(len(items), 0, -1))
    ax.set_yticklabels(labels)
    fig.tight_layout()
    return ax


def energyplot(trace, figsize=None, **kwargs):
    """Energy transition vs marginal (cf. ArviZ ``plot_energy``)."""
    import matplotlib.pyplot as plt
    energy = np.asarray(trace.get_sampler_stats("energy"))
    fig, ax = plt.subplots(figsize=figsize or (8, 4))
    e_c = energy - energy.mean()
    de = np.diff(energy)
    for vals, label in [(e_c, "energy marginal"),
                        (de, "energy transition")]:
        x, y = _kde(vals)
        ax.plot(x, y, label=label)
        ax.fill_between(x, y, alpha=0.3)
    ax.legend()
    ax.set_yticks([])
    return ax


def autocorrplot(trace, var_names=None, max_lag=100, figsize=None,
                 **kwargs):
    """Autocorrelation per chain (cf. ArviZ ``plot_autocorr``)."""
    data = _extract(trace, var_names)
    items = list(_flat_iter(data))
    fig, axes = _get_axes(len(items), figsize, ncols=1)
    for i, (label, ary) in enumerate(items):
        ax = axes[i][0]
        for c in range(ary.shape[0]):
            x = ary[c] - ary[c].mean()
            acf = np.correlate(x, x, "full")[len(x) - 1:]
            acf = acf[:max_lag] / acf[0]
            ax.vlines(np.arange(len(acf)), 0, acf, alpha=0.5)
        ax.set_title(label)
        ax.axhline(0, color="k", lw=0.5)
    fig.tight_layout()
    return axes


def densityplot(trace, var_names=None, figsize=None, **kwargs):
    """cf. ArviZ ``plot_density``."""
    import matplotlib.pyplot as plt
    data = _extract(trace, var_names)
    items = list(_flat_iter(data))
    fig, axes = _get_axes(len(items), figsize, ncols=1)
    for i, (label, ary) in enumerate(items):
        ax = axes[i][0]
        x, y = _kde(ary.ravel())
        ax.plot(x, y)
        ax.fill_between(x, y, alpha=0.3)
        ax.set_title(label)
        ax.set_yticks([])
    fig.tight_layout()
    return axes


kdeplot = densityplot


def pairplot(trace, var_names=None, figsize=None, divergences=False,
             **kwargs):
    """Pairwise scatter (cf. ArviZ ``plot_pair``)."""
    import matplotlib.pyplot as plt
    data = _extract(trace, var_names)
    items = list(_flat_iter(data))
    k = len(items)
    fig, axes = plt.subplots(k, k, figsize=figsize or (2.2 * k, 2.2 * k),
                             squeeze=False)
    div = None
    if divergences:
        try:
            div = np.asarray(trace.get_sampler_stats("diverging")).ravel()
        except Exception:
            div = None
    for i, (li, ai) in enumerate(items):
        for j, (lj, aj) in enumerate(items):
            ax = axes[i][j]
            if i == j:
                x, y = _kde(ai.ravel())
                ax.plot(x, y)
            else:
                xi, xj = aj.ravel(), ai.ravel()
                ax.scatter(xi, xj, s=2, alpha=0.3)
                if div is not None and div.shape == xi.shape:
                    ax.scatter(xi[div], xj[div], s=6, c="r")
            if i == k - 1:
                ax.set_xlabel(lj)
            if j == 0:
                ax.set_ylabel(li)
    fig.tight_layout()
    return axes


def compareplot(comp_df, figsize=None, **kwargs):
    """Model-comparison plot (cf. ``plots/compareplot.py``)."""
    import matplotlib.pyplot as plt
    fig, ax = plt.subplots(figsize=figsize or (6, 0.5 * len(comp_df) + 1))
    ic = [c for c in comp_df.columns if c in ("loo", "waic")][0]
    yticks = np.arange(len(comp_df))[::-1]
    ax.errorbar(comp_df[ic], yticks, xerr=comp_df["se"], fmt="ko",
                mfc="None")
    ax.set_yticks(yticks)
    ax.set_yticklabels(comp_df.index)
    ax.set_xlabel(ic.upper())
    return ax
