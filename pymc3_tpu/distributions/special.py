"""Special functions (cf. ``pymc3/distributions/special.py``)."""
import jax.numpy as jnp
import jax.scipy.special as jss

__all__ = ["gammaln", "multigammaln", "psi", "log_i0", "digamma"]

gammaln = jss.gammaln
digamma = jss.digamma
psi = jss.digamma


def multigammaln(a, p):
    """Multivariate log gamma of dimension p (cf. ``special.py:26``)."""
    return jss.multigammaln(a, p)


def log_i0(x):
    """log of modified Bessel I0, stable for large |x| (cf. ``special.py:40``).

    Uses the exp-scaled intrinsic: log I0(x) = log(i0e(x)) + |x|.
    """
    return jnp.log(jss.i0e(x)) + jnp.abs(x)
