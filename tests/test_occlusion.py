"""Occlusion generator tests (fixed-shape invariants + semantics)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ured_tpu.data.occlusion import occlude, random_rotate, recenter


def _cloud(rng, b=2, n=256):
    pts = jnp.asarray(rng.normal(size=(b, n, 3)), jnp.float32)
    sem = jnp.asarray(rng.integers(0, 4, size=(b, n)))
    return pts, sem


@pytest.mark.parametrize("mode", ["ball", "slice", "random", "part", "mixed"])
def test_occlude_shapes_and_validity(rng, mode):
    pts, sem = _cloud(rng)
    occ, idx = occlude(pts, sem, jax.random.PRNGKey(0), mode=mode)
    b, n, _ = pts.shape
    assert occ.shape == (b, n // 2, 3)
    assert idx.shape == (b, n // 2)
    for bi in range(b):
        ii = np.asarray(idx[bi])
        assert len(np.unique(ii)) == n // 2  # no duplicates
        np.testing.assert_allclose(np.asarray(occ[bi]),
                                   np.asarray(pts[bi])[ii])


def test_ball_removes_a_contiguous_region(rng):
    # a dense line of points: ball occlusion must drop a contiguous chunk
    n = 256
    pts = jnp.asarray(
        np.stack([np.linspace(0, 1, n), np.zeros(n), np.zeros(n)], -1),
        jnp.float32)[None]
    sem = jnp.zeros((1, n), jnp.int32)
    occ, idx = occlude(pts, sem, jax.random.PRNGKey(1), mode="ball")
    kept = set(np.asarray(idx[0]).tolist())
    dropped = np.asarray([i for i in range(n) if i not in kept])
    # the dropped set must contain a long contiguous run (a "ball" on the
    # line), unlike uniform-random dropout
    runs = np.split(dropped, np.where(np.diff(dropped) != 1)[0] + 1)
    assert max(len(r) for r in runs) >= 8


def test_slice_keeps_far_half(rng):
    pts, sem = _cloud(rng, b=1)
    occ, idx = occlude(pts, sem, jax.random.PRNGKey(2), mode="slice")
    assert idx.shape == (1, 128)


def test_part_drops_one_semantic(rng):
    n = 256
    pts = jnp.asarray(rng.normal(size=(1, n, 3)), jnp.float32)
    # two parts: 0 -> 192 points, 1 -> 64 points
    sem = jnp.asarray(np.array([0] * 192 + [1] * 64)[None])
    # try several keys; when part 1 is picked, all its points must vanish
    found = False
    for s in range(8):
        occ, idx = occlude(pts, sem, jax.random.PRNGKey(s), mode="part")
        kept_sem = np.asarray(sem[0])[np.asarray(idx[0])]
        if (kept_sem == 0).all():
            found = True
            break
    assert found, "part occlusion never dropped the minority part"


def test_recenter_and_rotate(rng):
    pts, _ = _cloud(rng, b=3, n=64)
    centered, mean = recenter(pts)
    np.testing.assert_allclose(np.asarray(centered.mean(-2)), 0.0, atol=1e-5)
    rot = random_rotate(centered, jax.random.PRNGKey(0), max_deg=10.0)
    # rotation preserves norms
    np.testing.assert_allclose(
        np.asarray(jnp.linalg.norm(rot, axis=-1)),
        np.asarray(jnp.linalg.norm(centered, axis=-1)), atol=1e-4)
