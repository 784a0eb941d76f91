"""Utilities: optional-dep shims, time series, sorting, stats, checkpointing.

Also mirrors the reference's ``poor_man_gplvm.utils`` surface
(``post_fit_sort_neuron``, numpy ``rbf_kernel``, ``pca_init``).
"""

from poor_man_gplvm_tpu.utils.sorting import (  # noqa: F401
    pca_init,
    post_fit_sort_neuron,
    post_fit_sort_neurons,
    rbf_kernel,
)
