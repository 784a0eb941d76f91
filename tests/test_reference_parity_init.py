"""In-tree reference parity: initializers, the seeded jump-consensus
shuffle null, and the Moser MAT-file preprocessing.

Third companion to test_reference_parity.py — all comparisons run the
ACTUAL reference code from /root/reference on identical synthetic inputs.
The label initializer additionally exercises the repo's pynapple-compat
classes through real reference call sites (value_from / get_slice /
time_support — reference initializer.py:53-77).  Marker: reference.
"""

import os
import sys

import numpy as np
import pytest
from scipy.io import savemat

_SCRIPTS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"
)
if _SCRIPTS not in sys.path:
    sys.path.insert(0, _SCRIPTS)

from _reference_stubs import (  # noqa: E402
    install_reference_stubs,
    reference_available,
    uninstall_reference_stubs,
)

pytestmark = [
    pytest.mark.reference,
    pytest.mark.skipif(
        not reference_available(), reason="reference checkout not available"
    ),
]


@pytest.fixture(scope="module", autouse=True)
def _reference_stub_scope():
    install_reference_stubs()
    yield
    uninstall_reference_stubs()


# ---------------------------------------------------------------------------
# initializers (reference initializer.py:11-86)
# ---------------------------------------------------------------------------


def test_init_with_pca_parity():
    import jax.random as jr
    import poor_man_gplvm.initializer as ref
    import poor_man_gplvm_tpu.initializers as ours

    rng = np.random.default_rng(0)
    y = rng.poisson(2.0, size=(80, 15)).astype(float)
    for kw in (
        dict(n_latent_bin=8),
        dict(n_latent_bin=8, n_pca_components=5),
        dict(n_latent_bin=8, noise_scale=0.1, key=jr.PRNGKey(7)),
    ):
        r = np.asarray(ref.init_with_pca(y, **kw))
        o = np.asarray(ours.init_with_pca(y, **kw))
        np.testing.assert_allclose(o, r, rtol=1e-5, atol=1e-6, err_msg=str(kw))


def test_init_with_label_parity_aligned():
    """t_l=None branch: label already aligned (reference initializer.py:79-86)."""
    import poor_man_gplvm.initializer as ref
    import poor_man_gplvm_tpu.initializers as ours
    from poor_man_gplvm_tpu.utils.timeseries import Tsd

    rng = np.random.default_rng(1)
    t = np.arange(60) * 0.5
    label = Tsd(d=np.abs(np.sin(t / 3.0)) * 10, t=t)
    r = np.asarray(ref.init_with_label_1D(label, n_latent_bin=12, seed=3))
    o = np.asarray(ours.init_with_label_1D(label, n_latent_bin=12, seed=3))
    np.testing.assert_allclose(o, r, rtol=1e-9, atol=1e-12)


def test_init_with_label_parity_interpolated():
    """t_l branch: behavior supported on a sub-interval of the spike grid —
    runs the reference through the compat Ts.value_from/get_slice/
    time_support surface (reference initializer.py:53-77)."""
    import poor_man_gplvm.initializer as ref
    import poor_man_gplvm_tpu.initializers as ours
    from poor_man_gplvm_tpu.utils.timeseries import Tsd

    t_beh = 5.0 + np.arange(40) * 0.5  # [5, 24.5]
    label = Tsd(d=np.linspace(0, 9.9, 40), t=t_beh)
    t_l = np.arange(60) * 0.5  # [0, 29.5] — larger support
    r = np.asarray(
        ref.init_with_label_1D(label, n_latent_bin=10, t_l=t_l, seed=5)
    )
    o = np.asarray(
        ours.init_with_label_1D(label, n_latent_bin=10, t_l=t_l, seed=5)
    )
    np.testing.assert_allclose(o, r, rtol=1e-9, atol=1e-12)


# ---------------------------------------------------------------------------
# jump-consensus shuffle null (reference model_selection_helper.py:302-420)
# ---------------------------------------------------------------------------


def test_get_jump_consensus_shuffle_parity():
    import jax.random as jr
    import poor_man_gplvm.model_selection_helper as ref
    from poor_man_gplvm_tpu import selection as ours

    rng = np.random.default_rng(2)
    T, n_chain = 150, 4
    jump_p_all = (rng.random((T, n_chain)) > 0.85).astype(float) * rng.random(
        (T, n_chain)
    )
    jump_p = jump_p_all[:, 1]
    r = ref.get_jump_consensus_shuffle(
        jump_p, jump_p_all, chain_index=1, n_shuffle=50, key=jr.PRNGKey(42)
    )
    o = ours.get_jump_consensus_shuffle(
        jump_p, jump_p_all, chain_index=1, n_shuffle=50, key=jr.PRNGKey(42)
    )
    assert set(o) >= set(r)
    for k in r:
        np.testing.assert_allclose(
            np.asarray(o[k]), np.asarray(r[k]), rtol=1e-6, atol=1e-8,
            err_msg=k,
        )


# ---------------------------------------------------------------------------
# Moser MAT preprocessing (reference root core.py:392-684)
# ---------------------------------------------------------------------------


@pytest.fixture()
def moser_mat(tmp_path):
    """Synthetic `Dsession` navigation struct (t/x/y/z tracking + MEC/HC
    unit struct arrays with id/ks2Label/spikeTimes/meanRate)."""
    rng = np.random.default_rng(3)
    t = 100.0 + np.arange(400) * 0.1  # absolute tracking times
    x = np.cumsum(rng.normal(0, 0.01, 400))
    y = np.cumsum(rng.normal(0, 0.01, 400))
    z = np.zeros(400)

    def unit(uid, label, n_spk):
        return {
            "id": uid,
            "ks2Label": label,
            # spikes straddling the tracked window to exercise clipping
            "spikeTimes": np.sort(rng.uniform(95.0, 145.0, n_spk)),
            "meanRate": float(n_spk) / 50.0,
        }

    mec = np.array(
        [unit("2_1039", "good", 300), unit("2_1040", "mua", 200)],
        dtype=object,
    )
    hc = np.array(
        [unit("7_2001", "good", 250), unit("7_2002", "noise", 150)],
        dtype=object,
    )
    path = os.path.join(str(tmp_path), "rat_session.mat")
    savemat(
        path,
        {"Dsession": {"t": t, "x": x, "y": y, "z": z,
                      "units": {"mec": mec, "hc": hc}}},
    )
    return path


@pytest.mark.parametrize(
    "kw",
    [
        dict(),
        dict(use_units="good", sigma=1.0, zscore=True),
        dict(locations="mec", window_size=0.5, step_size=0.25),
    ],
)
def test_preprocess_moser_data_parity(ref_fork, moser_mat, kw):
    from poor_man_gplvm_tpu.data import preprocess_moser_data

    r = ref_fork.preprocess_moser_data(moser_mat, **kw)
    o = preprocess_moser_data(moser_mat, **kw)
    assert len(o) == len(r) == 7  # the 7-value contract (core.py:684)
    for i, (a, b) in enumerate(zip(o, r)):
        a, b = np.asarray(a), np.asarray(b)
        assert a.shape == b.shape, (i, a.shape, b.shape)
        if a.dtype.kind in "OUS" or b.dtype.kind in "OUS":
            np.testing.assert_array_equal(a.astype(str), b.astype(str))
        else:
            np.testing.assert_allclose(a, b, rtol=1e-9, atol=1e-12,
                                       err_msg=str(i))


@pytest.fixture(scope="module")
def ref_fork():
    import importlib.util

    ref_core = os.path.join(
        os.environ.get("PMG_REFERENCE_DIR", "/root/reference"), "core.py"
    )
    spec = importlib.util.spec_from_file_location("ref_fork_core2", ref_core)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod
