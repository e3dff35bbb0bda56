"""Unit tests for tritables.sorted_table_budgeted's tier selection.

The fused pipeline's correctness contract (pipeline.sort_expand_table,
fused_kernel streaming): the kernel only ever streams sorted-table
positions < live_end, so the budgeted gather must agree with the plain
sorted gather on [0, live_end) for EVERY live count — including counts
that sit exactly on a tier cut.  Frame-level tests exercise whatever
tier their scene happens to hit; this sweeps all boundaries, including
the production frac tuples used for the main and wide-pair ext tables
(pipeline.py sort_expand_table).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from ash_renderer_tpu.ops import tritables


def _plain(comb, order, pad_rows):
    s = comb.shape[0]
    order_p = np.pad(np.asarray(order), (0, pad_rows), constant_values=s - 1)
    return np.asarray(comb)[np.clip(order_p, 0, s - 1)]


@pytest.mark.parametrize(
    "fracs",
    [
        (0.25, 0.5),                      # main sorted table (pipeline.py)
        (1 / 32, 1 / 4),                  # wide-pair ext table (pipeline.py)
        (1 / 32, 1 / 8, 1 / 4, 1 / 2),    # denser ladder (mechanism check;
        # NOT used in production — measured on hardware to blow the front
        # program's device load ~4x for zero runtime win)
    ],
)
def test_budgeted_prefix_matches_plain_at_every_tier(fracs):
    rng = np.random.default_rng(11)
    s, cols, pad = 1024, 16, 48
    comb = jnp.asarray(rng.integers(1, 1 << 20, (s, cols)).astype(np.int32))
    order = jnp.asarray(rng.permutation(s).astype(np.int32))
    plain = _plain(comb, order, pad)
    n = s + pad

    # the exact static cuts the implementation chooses from — shared
    # helper, so the probe points always track the implementation
    qs = tritables.budget_cuts(n, fracs)
    assert qs, "test shapes must produce at least one real tier"

    # live counts straddling every boundary + extremes
    les = {0, 1, n, n - 1}
    for q in qs:
        les.update((q - 1, q, q + 1))
    for le in sorted(les):
        out = np.asarray(
            tritables.sorted_table_budgeted(
                comb, order, pad, jnp.int32(le), fracs=fracs
            )
        )
        assert out.shape == plain.shape
        # contract: identical on the streamed prefix
        np.testing.assert_array_equal(out[:le], plain[:le], err_msg=f"le={le}")
        # beyond the chosen cut rows are zero-filled, and the cut chosen is
        # the smallest covering tier (minimality = the perf property)
        cut = next((q for q in qs if le <= q), n)
        np.testing.assert_array_equal(out[:cut], plain[:cut])
        assert not out[cut:].any(), f"rows past cut {cut} must be zero (le={le})"


def test_tiny_table_falls_back_to_full_gather():
    rng = np.random.default_rng(3)
    # n = s + pad = 8: every frac rounds up to a cut >= n, so no tier
    # splits and the implementation must return the plain full gather
    s, cols, pad = 4, 4, 4
    comb = jnp.asarray(rng.integers(1, 100, (s, cols)).astype(np.int32))
    order = jnp.asarray(rng.permutation(s).astype(np.int32))
    out = np.asarray(
        tritables.sorted_table_budgeted(comb, order, pad, jnp.int32(2))
    )
    np.testing.assert_array_equal(out, _plain(comb, order, pad))
