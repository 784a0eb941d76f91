"""Post-fit analysis layer (reference L8: analysis_helper, distance_analysis,
reactivation_analysis, trial_analysis)."""

from poor_man_gplvm_tpu.analysis.ccg import (
    compute_acg_counts,
    compute_ccg_counts,
    theta_skipping_index,
)
from poor_man_gplvm_tpu.analysis.distance import (
    compute_distance_lag,
    distance_vs_label_regression,
    get_transmat_and_shuffle,
    interpolate_compute_dist_mat,
    interpolate_stacks,
    labels_to_transition_matrix,
    shuffle_test_distance_vs_label,
    w1_cdf_distance_matrix,
)
from poor_man_gplvm_tpu.analysis.posterior import (
    get_consecutive_pv_distance,
    get_peri_event_with_shuffle,
    get_posterior_weighted_average,
    get_sequence_occurence,
    get_state_interval,
    shift_timestamp,
)
from poor_man_gplvm_tpu.analysis.reactivation import (
    aggregate_within_ripple_per_epoch,
    circular_shuffle_column_independently,
    circular_shuffle_spikes_within_epoch_and_decode,
    decode_pre_post,
    generate_homogeneous_poisson_surrogate_data,
    random_reassign_prepost_latent_difference,
)
from poor_man_gplvm_tpu.analysis.regression import fit_time_prepost_interaction
from poor_man_gplvm_tpu.analysis.trial import (
    get_event_phase_in_trial,
    plot_event_range,
)

__all__ = [
    "aggregate_within_ripple_per_epoch",
    "compute_acg_counts",
    "compute_ccg_counts",
    "theta_skipping_index",
    "circular_shuffle_column_independently",
    "circular_shuffle_spikes_within_epoch_and_decode",
    "compute_distance_lag",
    "decode_pre_post",
    "distance_vs_label_regression",
    "fit_time_prepost_interaction",
    "generate_homogeneous_poisson_surrogate_data",
    "get_consecutive_pv_distance",
    "get_event_phase_in_trial",
    "get_peri_event_with_shuffle",
    "get_posterior_weighted_average",
    "get_sequence_occurence",
    "get_state_interval",
    "get_transmat_and_shuffle",
    "interpolate_compute_dist_mat",
    "interpolate_stacks",
    "labels_to_transition_matrix",
    "plot_event_range",
    "random_reassign_prepost_latent_difference",
    "shift_timestamp",
    "shuffle_test_distance_vs_label",
    "w1_cdf_distance_matrix",
]
