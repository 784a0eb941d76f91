"""Tuning-curve basis generation.

TPU-native equivalent of the reference's ``generate_basis``
(reference: poor_man_gplvm/core.py:41-73): SVD of the (L, L) RBF Gram
matrix, keep the leading ``n_basis`` singular vectors scaled by the fourth
root of the singular values, prepend a bias column.

``n_basis`` is data-dependent (cumulative-explained-variance rule), so it is
computed *host-side* at model-construction time — all downstream jitted
programs then see static shapes (SURVEY.md §7.2 step 1).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from poor_man_gplvm_tpu.ops.kernels import rbf_gram

__all__ = ["generate_basis"]


def generate_basis(
    lengthscale,
    n_latent_bin,
    explained_variance_threshold_basis=0.999,
    include_bias=True,
    basis_type="rbf",
    custom_kernel=None,
):
    """Build the (L, n_basis[+1]) tuning basis.

    Rank rule (reference core.py:54): ``n_basis = (cumsum(s / s.sum()) <
    thresh).sum() + 1`` — the first index whose cumulative share crosses the
    threshold.  Columns scaled by ``s**0.25`` (the *fourth* root,
    reference core.py:55-56).
    """
    if custom_kernel is not None:
        basis_type = "custom_kernel"

    if basis_type == "rbf":
        possible_latent_bin = jnp.arange(n_latent_bin)
        gram, _ = rbf_gram(possible_latent_bin, lengthscale, 1.0)
    elif basis_type == "custom_kernel":
        if custom_kernel is None:
            raise ValueError(
                "custom_kernel must be provided when basis_type is custom_kernel"
            )
        gram = jnp.asarray(custom_kernel)
    else:
        raise ValueError(f"Unsupported basis_type: {basis_type!r}")

    tuning_basis, sing_val, _ = jnp.linalg.svd(gram)
    # host-side, concrete: keeps downstream shapes static
    sing_val_np = np.asarray(sing_val)
    n_basis = int((np.cumsum(sing_val_np / sing_val_np.sum()) <
                   explained_variance_threshold_basis).sum()) + 1
    quarter_root = jnp.sqrt(jnp.sqrt(sing_val[:n_basis]))
    tuning_basis = tuning_basis[:, :n_basis] * quarter_root[None, :]

    if include_bias:
        n_rows = tuning_basis.shape[0]
        tuning_basis = jnp.concatenate(
            [jnp.ones((n_rows, 1), dtype=tuning_basis.dtype), tuning_basis], axis=1
        )
    return tuning_basis
