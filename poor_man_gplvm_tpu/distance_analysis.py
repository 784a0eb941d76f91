"""Reference-compatible distance-analysis module (mirrors
``poor_man_gplvm.distance_analysis``)."""

from poor_man_gplvm_tpu.analysis.distance import (  # noqa: F401
    compute_distance_lag,
    distance_vs_label_regression,
    get_transmat_and_shuffle,
    interpolate_compute_dist_mat,
    interpolate_stacks,
    labels_to_transition_matrix,
    shuffle_test_distance_vs_label,
    w1_cdf_distance_matrix,
)
