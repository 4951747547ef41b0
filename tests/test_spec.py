"""Data-layout tests: padded pack/unpack round trips and spec derivation."""

import numpy as np
import pytest

from spatial_alignment_tpu.models.spec import (
    build_spec,
    create_view_idx_dict,
    pack_batch,
    unpack_points,
    view_slices,
)

from conftest import make_two_view_data


def test_pack_unpack_roundtrip(rng):
    n1, n2 = 13, 7
    X = rng.uniform(0, 10, (n1 + n2, 2)).astype(np.float32)
    Y = rng.standard_normal((n1 + n2, 4)).astype(np.float32)
    dd = {"expression": {"spatial_coords": X, "outputs": Y, "n_samples_list": [n1, n2]}}
    spec = build_spec(dd, m_X_per_view=4, m_G=4)
    batch = pack_batch(spec, dd)
    assert batch["expression"]["coords"].shape == (2, 13, 2)  # padded to max view
    np.testing.assert_array_equal(
        np.asarray(batch["expression"]["mask"]).sum(axis=1), [13, 7]
    )
    # round trip through unpack restores the reference layout exactly
    X_rt = unpack_points(spec, "expression", np.asarray(batch["expression"]["coords"]))
    np.testing.assert_array_equal(X_rt, X)
    Y_rt = unpack_points(spec, "expression", np.asarray(batch["expression"]["outputs"]))
    np.testing.assert_array_equal(Y_rt, Y)


def test_unpack_with_leading_axes(rng):
    n1, n2 = 5, 3
    dd = {
        "expression": {
            "spatial_coords": rng.uniform(0, 1, (n1 + n2, 2)).astype(np.float32),
            "outputs": rng.standard_normal((n1 + n2, 2)).astype(np.float32),
            "n_samples_list": [n1, n2],
        }
    }
    spec = build_spec(dd, m_X_per_view=2, m_G=2)
    arr = rng.standard_normal((4, 2, 5, 3))  # (S, V, Np, C)
    out = unpack_points(spec, "expression", arr)
    assert out.shape == (4, 8, 3)
    np.testing.assert_array_equal(out[:, :n1], arr[:, 0, :n1])
    np.testing.assert_array_equal(out[:, n1:], arr[:, 1, :n2])


def test_view_slices():
    assert view_slices([3, 0, 2]) == [(0, 3), (3, 3), (3, 5)]


def test_pad_multiple(rng):
    dd = make_two_view_data(n_per_view=30)
    spec = build_spec(dd, m_X_per_view=4, m_G=4, pad_multiple=8)
    assert spec.modality("expression").n_padded == 32


def test_create_view_idx_dict_matches_reference_semantics():
    dd = make_two_view_data(n_per_view=10)
    spec = build_spec(dd, m_X_per_view=4, m_G=4)
    vi, Ns, Ps, n_total = create_view_idx_dict(spec)
    np.testing.assert_array_equal(vi["expression"][0], np.arange(10))
    np.testing.assert_array_equal(vi["expression"][1], np.arange(10, 20))
    assert Ns == {"expression": 20} and n_total == 20


def test_spec_is_hashable_static_arg():
    dd = make_two_view_data(n_per_view=6)
    spec = build_spec(dd, m_X_per_view=3, m_G=3)
    assert hash(spec) == hash(spec.replace())
    assert spec != spec.replace(m_G=5)


def test_spec_dict_round_trip_and_old_checkpoint_compat():
    """spec_to_dict/spec_from_dict round-trips every field (checkpoints embed
    the dict), and a dict from an older checkpoint that predates
    merged_factor_dispatch loads with the default (True)."""
    import dataclasses

    from spatial_alignment_tpu.models.spec import spec_to_dict, spec_from_dict
    from conftest import make_two_view_data
    import spatial_alignment_tpu as sat

    data = make_two_view_data()
    model = sat.VariationalGPSA(
        data, m_X_per_view=6, m_G=6, n_latent_gps={"expression": 2},
        fixed_view_idx=0, triangular_variational=True,
    )
    spec = dataclasses.replace(model.spec, merged_factor_dispatch=False)
    d = spec_to_dict(spec)
    assert d["merged_factor_dispatch"] is False
    assert spec_from_dict(d) == spec

    d_old = dict(d)
    del d_old["merged_factor_dispatch"]  # pre-field checkpoint manifest
    assert spec_from_dict(d_old).merged_factor_dispatch is True
