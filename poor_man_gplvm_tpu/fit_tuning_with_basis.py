"""Reference-compatible legacy per-neuron M-step module (mirrors
``poor_man_gplvm.fit_tuning_with_basis`` — reference
fit_tuning_with_basis.py:13-114; the LBFGS runs on optax.lbfgs since
jaxopt is absent from this image, a documented divergence)."""

from poor_man_gplvm_tpu.ops.fit_tuning_with_basis import (  # noqa: F401
    gaussian_logprior,
    get_log_poisson_p_y_given_params_oneneuron_grouped,
    get_log_poisson_p_y_joint_params_oneneuron_grouped,
    get_log_prior_params,
    get_s_b,
    glm_get_tuning,
    group_spk_occupancy_chunk_neuron,
    m_step_get_tuning_all_neuron_grouped,
)
