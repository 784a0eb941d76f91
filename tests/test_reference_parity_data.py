"""In-tree reference parity for the fork DATA layer (reference root
core.py — binning conventions, burst detection, CV splits, naive-Bayes
baseline decoders).

Companion to test_reference_parity.py (model classes) and
test_reference_parity_analysis.py (analysis layer): the reference's root
core.py is imported directly from /root/reference and compared on
identical synthetic inputs, including a synthetic Kilosort directory for
the file-based loaders.  Windowing conventions are the most drift-prone
surface in the data layer (three distinct conventions — SURVEY §2.3).
Skips when the reference checkout is absent.  Marker: reference.
"""

import importlib.util
import os

import numpy as np
import pandas as pd
import pytest

REFERENCE_DIR = os.environ.get("PMG_REFERENCE_DIR", "/root/reference")
_REF_CORE = os.path.join(REFERENCE_DIR, "core.py")

pytestmark = [
    pytest.mark.reference,
    pytest.mark.skipif(
        not os.path.exists(_REF_CORE), reason="reference checkout absent"
    ),
]


@pytest.fixture(scope="module")
def ref():
    spec = importlib.util.spec_from_file_location("ref_fork_core", _REF_CORE)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def synth_spikes():
    rng = np.random.default_rng(0)
    n_spk = 4000
    spike_times = np.sort(rng.uniform(0.0, 60.0, n_spk))
    spike_clusters = rng.integers(0, 8, n_spk)
    return spike_times, spike_clusters


@pytest.fixture()
def kilosort_dir(tmp_path, synth_spikes):
    """Synthetic Kilosort output directory (reference core.py:95-150)."""
    spike_times, spike_clusters = synth_spikes
    fs = 30000.0
    np.save(tmp_path / "spike_times.npy",
            (spike_times * fs).astype(np.int64))
    np.save(tmp_path / "spike_clusters.npy", spike_clusters.astype(np.int32))
    (tmp_path / "params.py").write_text(f"sample_rate = {fs}\n")
    labels = ["good", "mua", "noise", "good", "good", "mua", "good", "noise"]
    pd.DataFrame(
        {"cluster_id": np.arange(8), "KSLabel": labels}
    ).to_csv(tmp_path / "cluster_KSLabel.tsv", sep="\t", index=False)
    return str(tmp_path)


# ---------------------------------------------------------------------------
# binning (reference core.py:49-211, :215-390, :917-1036)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "kw",
    [
        dict(window_size=1.0, step_size=1.0, sigma=0, zscore=False),
        dict(window_size=1.0, step_size=0.25, sigma=0, zscore=False),
        dict(window_size=0.5, step_size=0.2, sigma=2.0, zscore=True),
    ],
)
def test_compute_spike_counts_parity(ref, synth_spikes, kw):
    from poor_man_gplvm_tpu.data import compute_spike_counts

    spike_times, spike_clusters = synth_spikes
    r_mat, r_bins, r_units = ref.compute_spike_counts(
        spike_times, spike_clusters, **kw
    )
    o_mat, o_bins, o_units = compute_spike_counts(
        spike_times, spike_clusters, **kw
    )
    np.testing.assert_array_equal(o_units, r_units)
    np.testing.assert_allclose(o_bins, r_bins, rtol=1e-12)
    np.testing.assert_allclose(o_mat, r_mat, rtol=1e-9, atol=1e-12)


@pytest.mark.parametrize("use_units", ["all", "good", "good/mua"])
def test_kilosort_loaders_parity(ref, kilosort_dir, use_units):
    from poor_man_gplvm_tpu.data import (
        compute_spike_counts_old,
        compute_spike_rates,
    )

    for fn_name in ("compute_spike_rates", "compute_spike_counts_old"):
        r_fn = getattr(ref, fn_name)
        o_fn = (
            compute_spike_rates
            if fn_name == "compute_spike_rates"
            else compute_spike_counts_old
        )
        # adj="" (not the default None): both implementations replicate the
        # reference's f"spike_times{adj}.npy" quirk, where None would look
        # for "spike_timesNone.npy" (reference core.py:96)
        r_mat, r_bins, r_units = r_fn(
            kilosort_dir, window_size=1.0, step_size=0.5,
            use_units=use_units, sigma=1.5, zscore=True, adj="",
        )
        o_mat, o_bins, o_units = o_fn(
            kilosort_dir, window_size=1.0, step_size=0.5,
            use_units=use_units, sigma=1.5, zscore=True, adj="",
        )
        np.testing.assert_array_equal(o_units, r_units, err_msg=fn_name)
        np.testing.assert_allclose(o_bins, r_bins, rtol=1e-9,
                                   err_msg=fn_name)
        np.testing.assert_allclose(o_mat, r_mat, rtol=1e-7, atol=1e-9,
                                   err_msg=fn_name)


def test_presence_ratio_parity(ref, synth_spikes):
    from poor_man_gplvm_tpu.data import compute_spike_counts, get_presence_ratio

    spike_times, spike_clusters = synth_spikes
    mat, bins, _ = compute_spike_counts(
        spike_times, spike_clusters, window_size=1.0, step_size=0.5
    )
    mat[2, :] = 0.0  # a silent unit
    mat[3, : mat.shape[1] // 2] = 0.0  # present only in the second half
    r = ref.get_presence_ratio(mat, bins, n_coarse_bins=10)
    o = get_presence_ratio(mat, bins, n_coarse_bins=10)
    np.testing.assert_allclose(o, r, rtol=1e-12)


# ---------------------------------------------------------------------------
# bursts (reference core.py:1375-1420, :1266-1372)
# ---------------------------------------------------------------------------


def _mua(seed=1, T=2000):
    rng = np.random.default_rng(seed)
    z = rng.normal(0, 1, T)
    for c in (100, 500, 505, 1200, 1800):
        z[c : c + rng.integers(3, 25)] += 5.0
    return z


@pytest.mark.parametrize(
    "kw",
    [
        dict(),
        dict(BURST_THRESHOLD=2.5, BURST_BOUNDARY_THRESHOLD=0.5),
        dict(MIN_BURST_DURATION=0.1, MIN_INTERBURST_INTERVAL=0.5,
             STEP_SIZE=0.02),
    ],
)
def test_detect_population_bursts_parity(ref, kw):
    from poor_man_gplvm_tpu.data import detect_population_bursts

    z = _mua()
    r = ref.detect_population_bursts(z, **kw)
    o = detect_population_bursts(z, **kw)
    assert [tuple(map(int, b)) for b in o] == [
        tuple(map(int, b)) for b in r
    ]


def test_merge_overlapping_bursts_two_probes_parity(ref):
    from poor_man_gplvm_tpu.data import (
        detect_population_bursts,
        merge_overlapping_bursts_two_probes,
    )

    time_bins = np.arange(2000) * 0.01
    data = {}
    for probe, seed in (("probeA", 1), ("probeB", 2)):
        z = _mua(seed)
        data[probe] = {
            "time_bins": time_bins,
            "burst_boundaries": detect_population_bursts(z),
        }
    for strict in (True, False):
        rA, rB, r_groups = ref.merge_overlapping_bursts_two_probes(
            data, "probeA", "probeB", strict_overlap=strict
        )
        oA, oB, o_groups = merge_overlapping_bursts_two_probes(
            data, "probeA", "probeB", strict_overlap=strict
        )
        assert [tuple(b) for b in oA] == [tuple(b) for b in rA]
        assert [tuple(b) for b in oB] == [tuple(b) for b in rB]
        assert len(o_groups) == len(r_groups)
        for og, rg in zip(o_groups, r_groups):
            assert set(og) >= set(rg)
            for k in rg:
                np.testing.assert_array_equal(
                    np.asarray(og[k]), np.asarray(rg[k]), err_msg=k
                )


# ---------------------------------------------------------------------------
# grouping / sorting (reference core.py:1423-1516)
# ---------------------------------------------------------------------------


def test_collect_matrix_parity(ref):
    from poor_man_gplvm_tpu.data import (
        collect_matrix_for,
        collect_matrix_for_bilat,
    )

    rng = np.random.default_rng(3)
    probes = ["p0", "p1"]
    mats = {p: (rng.random((6, 20)), None, None) for p in probes}
    regions = {p: rng.choice(["CA1", "DG"], 6) for p in probes}
    cell_types = {p: rng.choice(["pyr", "int"], 6) for p in probes}
    hemis = {p: rng.choice(["L", "R"], 6) for p in probes}
    groups = {"exc": ["pyr"], "all": ["pyr", "int"]}
    for region in ("CA1", "DG"):
        for ctk in ("exc", "all"):
            r = ref.collect_matrix_for(
                mats, region, regions, ctk, cell_types, probes, groups
            )
            o = collect_matrix_for(
                mats, region, regions, ctk, cell_types, probes, groups
            )
            if r is None:
                assert o is None
            else:
                np.testing.assert_allclose(o, r)
            r2 = ref.collect_matrix_for_bilat(
                mats, region, regions, ctk, cell_types, probes, groups,
                "L", hemis,
            )
            o2 = collect_matrix_for_bilat(
                mats, region, regions, ctk, cell_types, probes, groups,
                "L", hemis,
            )
            if r2 is None:
                assert o2 is None
            else:
                np.testing.assert_allclose(o2, r2)


@pytest.mark.parametrize("mode", ["mean", "peak", "corr"])
def test_sort_units_parity(ref, mode):
    from poor_man_gplvm_tpu.data import sort_units

    rng = np.random.default_rng(4)
    mat = rng.random((10, 50))
    r = ref.sort_units(mat, mode=mode)
    o = sort_units(mat, mode=mode)
    assert isinstance(o, type(r)) or (
        np.asarray(o).shape == np.asarray(r).shape
    )
    np.testing.assert_array_equal(np.asarray(o), np.asarray(r))


# ---------------------------------------------------------------------------
# CV + baseline decoders (reference core.py:1522-1845)
# ---------------------------------------------------------------------------


def test_cv_split_and_dataset_parity(ref):
    from poor_man_gplvm_tpu.data import DecoderDataset, cv_split

    rng = np.random.default_rng(5)
    data = rng.random(503)
    for k in (0, 3, 9):
        r = ref.cv_split(data, k)
        o = cv_split(data, k)
        for a, b in zip(o, r):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    X = rng.poisson(2.0, size=(7, 503)).astype(float)
    Y = rng.integers(0, 5, 503)
    r_ds = ref.DecoderDataset(X, Y)
    o_ds = DecoderDataset(X, Y)
    (rXtr, rYtr), (rXte, rYte), r_tr_sw, r_te_sw = r_ds.split(2)
    (oXtr, oYtr), (oXte, oYte), o_tr_sw, o_te_sw = o_ds.split(2)
    np.testing.assert_allclose(oXtr, rXtr)
    np.testing.assert_allclose(oXte, rXte)
    np.testing.assert_array_equal(oYtr, rYtr)
    np.testing.assert_array_equal(oYte, rYte)
    np.testing.assert_array_equal(o_tr_sw, r_tr_sw)
    np.testing.assert_array_equal(o_te_sw, r_te_sw)


@pytest.mark.parametrize("uniform_prior", [False, True])
def test_bayes_decoders_parity(ref, uniform_prior):
    from poor_man_gplvm_tpu.data import (
        GaussianBayesDecoder,
        PoissonBayesDecoder,
    )

    rng = np.random.default_rng(6)
    K, N, T = 5, 7, 400
    Y = rng.integers(0, K, T)
    rates = rng.random((N, K)) * 4
    X_pois = rng.poisson(rates[:, Y]).astype(float)
    X_gaus = rates[:, Y] + rng.normal(0, 0.5, (N, T))
    # an unvisited state exercises the empty-bin floors
    Y[Y == K - 1] = K - 2

    r_g = ref.GaussianBayesDecoder(K, uniform_prior=uniform_prior)
    o_g = GaussianBayesDecoder(K, uniform_prior=uniform_prior)
    r_g.fit(X_gaus, Y)
    o_g.fit(X_gaus, Y)
    np.testing.assert_allclose(o_g.mu_, r_g.mu_, rtol=1e-9)
    np.testing.assert_allclose(o_g.var_, r_g.var_, rtol=1e-9)
    np.testing.assert_allclose(o_g.log_prior_, r_g.log_prior_, rtol=1e-9)
    np.testing.assert_allclose(
        o_g.predict_log_probabilities(X_gaus),
        r_g.predict_log_probabilities(X_gaus), rtol=1e-8, atol=1e-10,
    )
    np.testing.assert_array_equal(o_g.predict(X_gaus), r_g.predict(X_gaus))

    r_p = ref.PoissonBayesDecoder(K, uniform_prior=uniform_prior)
    o_p = PoissonBayesDecoder(K, uniform_prior=uniform_prior)
    r_p.fit(X_pois, Y)
    o_p.fit(X_pois, Y)
    np.testing.assert_allclose(o_p.rate_, r_p.rate_, rtol=1e-9)
    np.testing.assert_allclose(o_p.log_prior_, r_p.log_prior_, rtol=1e-9)
    np.testing.assert_allclose(
        o_p.predict_log_probabilities(X_pois),
        r_p.predict_log_probabilities(X_pois), rtol=1e-8, atol=1e-10,
    )
    np.testing.assert_array_equal(
        o_p.predict(X_pois), r_p.predict(X_pois)
    )
