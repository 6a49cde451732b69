"""Hash-anything memoization, mirroring ``pymc3/memoize.py:23-93``.

Used to cache traced/compiled logp functions keyed on model structure.
"""
import functools
import pickle

__all__ = ["memoize", "WithMemoization", "hashable", "clear_cache"]

CACHE_REGISTRY = []


def memoize(obj):
    """Decorator caching a function's return values keyed by hashable args."""
    cache = obj._cache = {}
    CACHE_REGISTRY.append(cache)

    @functools.wraps(obj)
    def memoizer(*args, **kwargs):
        key = (hashable(args), hashable(kwargs))
        if key not in cache:
            cache[key] = obj(*args, **kwargs)
        return cache[key]

    memoizer._cache = cache
    return memoizer


def clear_cache():
    for c in CACHE_REGISTRY:
        c.clear()


class WithMemoization:
    def __hash__(self):
        return hash(id(self))

    def __getstate__(self):
        state = self.__dict__.copy()
        state.pop("_cache", None)
        return state

    def __setstate__(self, state):
        self.__dict__.update(state)


def hashable(a):
    """Turn anything into a hashable key (pickling fallback, cf. memoize.py:76)."""
    if isinstance(a, dict):
        return hashable(tuple((hashable(k), hashable(v)) for k, v in a.items()))
    if isinstance(a, (tuple, list)):
        return tuple(hashable(x) for x in a)
    try:
        hash(a)
        return a
    except TypeError:
        pass
    try:
        return hash(pickle.dumps(a))
    except Exception:
        return id(a)
