"""Reference-compatible import surface: a user of the reference package can
switch imports from ``poor_man_gplvm`` to ``poor_man_gplvm_tpu`` and find
every module/function (reference poor_man_gplvm/__init__.py:6-12 and the
per-module public symbols from SURVEY.md §2)."""

import jax.numpy as jnp
import numpy as np
import pytest

import poor_man_gplvm_tpu as pmg


def test_toplevel_classes():
    for name in [
        "AbstractGPLVM1D", "AbstractGPLVMJump1D", "PoissonGPLVM1D",
        "GaussianGPLVM1D", "PoissonGPLVMJump1D", "GaussianGPLVMJump1D",
        "generate_basis",
    ]:
        assert hasattr(pmg, name)


def test_reference_submodules_present():
    for name in [
        "core", "test", "utils", "model_selection_helper", "experimental",
        "plot_helper", "analysis_helper", "distance_analysis",
        "gp_kernel", "decoder", "decoder_latentonly", "fit_tuning_helper",
        "initializer", "reactivation_analysis", "trial_analysis",
        "pandas_util", "verify_latent_jump",
    ]:
        assert hasattr(pmg, name), name


def test_module_symbols():
    assert callable(pmg.gp_kernel.create_transition_prob_1d)
    assert callable(pmg.gp_kernel.rbf_kernel)
    assert callable(pmg.decoder.smooth_all_step_combined_ma_chunk)
    assert callable(pmg.decoder.get_naive_bayes_ma_chunk)
    assert callable(pmg.decoder.compute_transition_posterior_prob)
    assert callable(
        pmg.decoder_latentonly.smooth_all_step_combined_ma_chunk_latent
    )
    assert callable(pmg.fit_tuning_helper.make_adam_runner)
    assert callable(pmg.fit_tuning_helper.poisson_m_step_objective)
    assert callable(pmg.model_selection_helper.model_selection_one_split)
    assert callable(pmg.model_selection_helper.get_jump_consensus)
    assert callable(pmg.test.circular_shuffle_data)
    assert callable(pmg.test.compute_entropy)
    assert callable(pmg.utils.post_fit_sort_neuron)
    assert callable(pmg.utils.rbf_kernel)
    assert callable(pmg.initializer.init_with_pca)
    assert callable(pmg.analysis_helper.get_posterior_weighted_average)
    assert callable(pmg.distance_analysis.compute_distance_lag)
    assert callable(pmg.reactivation_analysis.decode_pre_post)
    assert callable(pmg.pandas_util.filter_df_with_spec)
    assert callable(pmg.verify_latent_jump.segment_trial_by_jump)
    assert callable(pmg.plot_helper.plot_pynapple_data_mpl)
    assert hasattr(pmg.experimental, "PoissonGPLVMGain1D_gain")
    assert callable(pmg.model_selection_helper.default_fit_kwargs.get)


def test_decoder_compat_wrappers_run():
    """The reference-style functional decoder entry points execute and match
    the class path."""
    import jax.random as jr

    model = pmg.PoissonGPLVMJump1D(6, n_latent_bin=8, tuning_lengthscale=2.0)
    _, y = model.sample(40, key=jr.PRNGKey(0))

    from poor_man_gplvm_tpu.ops import kernels as gpk

    _, log_lat_l, _, log_dyn = gpk.create_transition_prob_1d(
        jnp.arange(8), jnp.arange(2), 1.0, 0.01, 0.01
    )
    out = pmg.decoder.smooth_all_step_combined_ma_chunk(
        y, model.tuning, {}, log_lat_l, log_dyn, jnp.ones(6), jnp.ones(8)
    )
    assert len(out) == 6
    res_cls = model.decode_latent(y)
    np.testing.assert_allclose(
        float(out[1]), res_cls["log_marginal_final"], rtol=1e-5
    )

    filt = pmg.decoder.filter_all_step_combined_ma(
        y, model.tuning, {}, log_lat_l, log_dyn, jnp.ones(6), jnp.ones(8)
    )
    assert len(filt) == 5

    # latent-only wrappers
    kern, log_kern = gpk.create_transition_prob_latent_1d(jnp.arange(8), 1.0)
    out_lat = pmg.decoder_latentonly.smooth_all_step_combined_ma_chunk_latent(
        y, model.tuning, {}, log_kern, jnp.ones(6), jnp.ones(8)
    )
    assert len(out_lat) == 6
    trans_res = pmg.decoder_latentonly.compute_transition_posterior_prob_latent(
        out_lat[4]
    )
    assert "p_transition_latent" in trans_res


def test_low_level_decoder_primitives():
    """The reference's per-step/per-chunk decoder primitives run and are
    self-consistent with the combined chunked driver."""
    import jax.random as jr
    from poor_man_gplvm_tpu.ops import emissions, kernels as gpk

    L, N, T = 6, 5, 15
    model = pmg.PoissonGPLVMJump1D(N, n_latent_bin=L, tuning_lengthscale=2.0)
    _, y = model.sample(T, key=jr.PRNGKey(0))
    _, log_lat_l, _, log_dyn = gpk.create_transition_prob_1d(
        jnp.arange(L), jnp.arange(2), 1.0, 0.01, 0.01
    )
    ll = emissions.get_loglikelihood_ma_all(
        y, model.tuning, {}, jnp.ones((T, N)), jnp.ones(L)
    )
    post, lml, prior, ratios = pmg.decoder.filter_all_step(
        ll, log_lat_l, log_dyn
    )
    assert post.shape == (T, 2, L)
    smooth, acc = pmg.decoder.smooth_all_step(
        post, prior[1:], log_lat_l, log_dyn
    )
    assert smooth.shape == (T, 2, L)
    ref = pmg.decoder.smooth_all_step_combined_ma_chunk(
        y, model.tuning, {}, log_lat_l, log_dyn, jnp.ones(N), jnp.ones(L),
        engine="log",
    )
    np.testing.assert_allclose(
        np.asarray(smooth), np.asarray(ref[0]), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(float(lml), float(ref[1]), rtol=1e-6)

    # single-step primitives
    ll_single = pmg.decoder.get_loglikelihood_ma_poisson(
        y[0], model.tuning, {}, jnp.ones(N), jnp.ones(L)
    )
    np.testing.assert_allclose(np.asarray(ll_single), np.asarray(ll[0]),
                               rtol=1e-5)
    carry = (
        jnp.log(jnp.ones((2, L)) / (2 * L)), jnp.array(0.0)
    )
    carry2, (p1, pr1, r1) = pmg.decoder.filter_one_step(
        carry, ll[0], log_lat_l, log_dyn
    )
    np.testing.assert_allclose(np.asarray(p1), np.asarray(post[0]), rtol=1e-5)
