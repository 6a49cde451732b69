"""Compound step method (cf. ``pymc3/step_methods/compound.py``).

Sequentially applies several steppers to one flat vector inside a single
traced program: the compound kernel threads ``q`` through each member kernel,
so a NUTS-over-continuous + Metropolis-over-discrete model still compiles to
ONE XLA program scanned over draws and vmapped over chains.
"""
from __future__ import annotations

import numpy as np
import jax

from .arraystep import TuneContext

__all__ = ["CompoundStep"]


class CompoundStep:
    """Step method composed of a list of several step methods applied in
    sequence (cf. ``compound.py:24``)."""

    def __init__(self, methods):
        self.methods = list(methods)
        self.generates_stats = any(m.generates_stats for m in self.methods)
        self.stats_dtypes = []
        for method in self.methods:
            if method.generates_stats:
                self.stats_dtypes.extend(method.stats_dtypes)
        self.name = "compound"
        self.tune = True

    # -- functional kernel ---------------------------------------------------
    def kernel_init(self, q0):
        return tuple(m.kernel_init(q0) for m in self.methods)

    def kernel_step(self, key, q, states, tctx: TuneContext):
        keys = jax.random.split(key, len(self.methods))
        new_states = []
        all_stats = []
        for k, method, state in zip(keys, self.methods, states):
            q, s_new, stats = method.kernel_step(k, q, state, tctx)
            new_states.append(s_new)
            if method.generates_stats:
                # nested CompoundStep returns a list of stat dicts; keep the
                # flat structure that parallels the extended stats_dtypes
                if isinstance(stats, list):
                    all_stats.extend(stats)
                else:
                    all_stats.append(stats)
        return q, tuple(new_states), all_stats

    # -- host-side single-draw API ------------------------------------------
    def step(self, point):
        stats_list = []
        for method in self.methods:
            if method.generates_stats:
                point, stats = method.step(point)
                stats_list.extend(stats)
            else:
                point = method.step(point)
        if self.generates_stats:
            return point, stats_list
        return point

    def warnings(self):
        warns = []
        for method in self.methods:
            if hasattr(method, "warnings"):
                warns.extend(method.warnings())
        return warns

    def stop_tuning(self):
        for method in self.methods:
            method.stop_tuning()
        self.tune = False

    def reset_tuning(self):
        for method in self.methods:
            if hasattr(method, "reset_tuning"):
                method.reset_tuning()

    @property
    def vars(self):
        return [var for method in self.methods for var in method.vars]

    def __repr__(self):
        return f"CompoundStep({[repr(m) for m in self.methods]})"
