"""Shape-algebra matrix for ``distributions/shape_utils.py``, mirroring
the reference's ``pymc3/tests/test_shape_handling.py:1`` (227 LoC):
every function checked against numpy broadcasting ground truth over the
same size x shapes grid, plus the end-to-end prior-predictive shape
contract on a hierarchical model."""
import numpy as np
import pytest

import pymc3_tpu as pm
from pymc3_tpu.distributions.shape_utils import (
    to_tuple,
    shapes_broadcasting,
    broadcast_dist_samples_shape,
    get_broadcastable_dist_samples,
    broadcast_distribution_samples,
    broadcast_dist_samples_to,
)

TEST_SHAPES = [
    ((), (1,), (4,), (5, 4)),
    ((), (1,), (7,), (5, 4)),
    ((), (1,), (1, 4), (5, 4)),
    ((), (1,), (5, 1), (5, 4)),
    ((), (1,), (3, 4), (5, 4)),
    ((), (1,), (5, 3), (5, 4)),
    ((), (1,), (10, 4), (5, 4)),
    ((), (1,), (10,), (5, 4)),
    ((), (1,), (1, 1, 4), (5, 4)),
    ((), (1,), (10, 1, 4), (5, 4)),
    ((), (1,), (10, 5, 4), (5, 4)),
]
TEST_SIZES = [None, (), 1, (1,), 10, (10,), (1, 1), (10, 1), (1, 10),
              (5,), (5, 4), (1, 1, 1, 1)]
TEST_TO_SHAPES = [None, (), (10, 5, 4), (10, 1, 1, 5, 1)]


@pytest.mark.parametrize("shape,want", [
    (None, ()), ((), ()), (3, (3,)), ((3,), (3,)), ([2, 4], (2, 4)),
    (np.array(5), (5,)), (np.array([2, 3]), (2, 3)),
])
def test_to_tuple(shape, want):
    assert to_tuple(shape) == want


@pytest.mark.parametrize("shapes", TEST_SHAPES, ids=str)
@pytest.mark.parametrize("raise_exception", [False, True], ids=str)
def test_shapes_broadcasting_vs_numpy(shapes, raise_exception):
    try:
        want = np.broadcast(*[np.empty(s) for s in shapes]).shape
    except ValueError:
        want = None
    if want is None:
        if raise_exception:
            with pytest.raises(ValueError):
                shapes_broadcasting(*shapes, raise_exception=True)
        else:
            assert shapes_broadcasting(*shapes) is None
    else:
        assert shapes_broadcasting(*shapes,
                                   raise_exception=raise_exception) == want


@pytest.mark.parametrize("size", TEST_SIZES, ids=str)
@pytest.mark.parametrize("shapes", TEST_SHAPES, ids=str)
def test_broadcast_dist_samples_shape_vs_numpy(size, shapes):
    """Ground truth per the reference: strip the size prepend where
    present, broadcast the cores, re-prepend size if any shape had it."""
    size_ = to_tuple(size)
    shapes_ = [s if s[:min(len(size_), len(s))] != size_ else s[len(size_):]
               for s in shapes]
    try:
        want = np.broadcast(*[np.empty(s) for s in shapes_]).shape
    except ValueError:
        want = None
    if want is not None and any(
            s[:min(len(size_), len(s))] == size_ for s in shapes):
        want = size_ + want
    if want is None:
        with pytest.raises(ValueError):
            broadcast_dist_samples_shape(shapes, size=size)
    else:
        assert broadcast_dist_samples_shape(shapes, size=size) == want


def _bcast_case(size, shapes):
    samples = [np.empty(s) for s in shapes]
    try:
        bshape = broadcast_dist_samples_shape(shapes, size=size)
    except ValueError:
        bshape = None
    return samples, bshape


@pytest.mark.parametrize("size", TEST_SIZES, ids=str)
@pytest.mark.parametrize("shapes", TEST_SHAPES, ids=str)
def test_broadcast_distribution_samples(size, shapes):
    samples, bshape = _bcast_case(size, shapes)
    if bshape is not None:
        outs = broadcast_distribution_samples(samples, size=size)
        assert all(o.shape == bshape for o in outs)
    else:
        with pytest.raises(ValueError):
            broadcast_distribution_samples(samples, size=size)


@pytest.mark.parametrize("size", TEST_SIZES, ids=str)
@pytest.mark.parametrize("shapes", TEST_SHAPES, ids=str)
def test_get_broadcastable_dist_samples(size, shapes):
    samples, bshape = _bcast_case(size, shapes)
    if bshape is None:
        with pytest.raises(ValueError):
            get_broadcastable_dist_samples(samples, size=size)
        return
    size_ = to_tuple(size)
    outs, out_shape = get_broadcastable_dist_samples(
        samples, size=size, return_out_shape=True)
    assert out_shape == bshape
    for i, o in zip(samples, outs):
        ishape = i.shape
        if ishape[:min(len(size_), len(ishape))] == size_:
            want = (size_ + (1,) * (len(bshape) - len(ishape))
                    + ishape[len(size_):])
        else:
            want = ishape
        assert o.shape == want
    assert shapes_broadcasting(*[o.shape for o in outs]) == bshape


@pytest.mark.parametrize("to_shape", TEST_TO_SHAPES, ids=str)
@pytest.mark.parametrize("size", TEST_SIZES, ids=str)
@pytest.mark.parametrize("shapes", TEST_SHAPES[:4], ids=str)
def test_broadcast_dist_samples_to(to_shape, size, shapes):
    samples, bshape = _bcast_case(size, shapes)
    if bshape is not None:
        try:
            bshape = broadcast_dist_samples_shape(
                [bshape, to_tuple(to_shape)], size=size)
        except ValueError:
            bshape = None
    if bshape is not None:
        outs = broadcast_dist_samples_to(to_shape, samples, size=size)
        assert all(o.shape == bshape for o in outs)
    else:
        with pytest.raises(ValueError):
            broadcast_dist_samples_to(to_shape, samples, size=size)


@pytest.mark.parametrize("samples", [None, (), 1, (1,), 10, (5,), (5, 4)],
                         ids=str)
def test_prior_predictive_shape_contract(samples):
    """End-to-end: prior predictive shapes are size + dist shape across a
    hierarchical model (reference ``test_sample_generate_values``)."""
    n, dim = 5, 4
    with pm.Model() as model:
        cov = pm.InverseGamma("cov", alpha=1.0, beta=1.0)
        x = pm.Normal("x", mu=np.ones(dim), sigma=pm.math.sqrt(cov),
                      shape=(n, dim))
        eps = pm.HalfNormal("eps", sigma=np.ones((n, 1)), shape=(n, dim))
        y = pm.Normal("y", mu=1.0, sigma=1.0, shape=(n,))
        prior = pm.sample_prior_predictive(samples=samples)
    # reference contract: size tuple leads the shape; None/()/1/(1,) are
    # scalar draws (backwards compatibility)
    size = to_tuple(samples)
    if size == (1,):
        size = ()
    for name, shape in (("cov", ()), ("x", (n, dim)), ("eps", (n, dim)),
                        ("y", (n,))):
        assert prior[name].shape == size + shape, name
