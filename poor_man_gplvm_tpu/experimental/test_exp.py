"""Reference-compatible gain shuffle test
(mirrors ``poor_man_gplvm.experimental.test_exp``)."""

from __future__ import annotations

import numpy as np
import tqdm

from poor_man_gplvm_tpu.experimental.gain import (  # noqa: F401
    shuffle_and_decode_gain,
)

__all__ = ["shuffle_and_decode", "shuffle_and_decode_gain"]


def shuffle_and_decode(model, spk_tsdf, n_time_per_chunk=10000, dt_l=1,
                       n_shuffle=100, ep=None, decoder_type="naive_bayes"):
    """Circular-shuffle null for the gain model, re-fitting the gain per
    shuffle (reference experimental/test_exp.py:5-23)."""
    from poor_man_gplvm_tpu.utils import compat
    from poor_man_gplvm_tpu.validation import circular_shuffle_data

    decoding_res_l = []
    for y_shuffled in tqdm.tqdm(
        circular_shuffle_data(spk_tsdf, n_shuffle=n_shuffle, ep=ep),
        total=n_shuffle,
    ):
        y_arr = y_shuffled.d if compat.is_tsdframe(y_shuffled) else y_shuffled
        model.gain = model.get_gain_mstep_chunk(
            y_arr, model.log_posterior, model.tuning,
            n_time_per_chunk=n_time_per_chunk,
        )
        if decoder_type == "naive_bayes":
            decoding_res = model.decode_latent_naive_bayes(
                y_arr, n_time_per_chunk=n_time_per_chunk, dt_l=dt_l
            )
        else:
            decoding_res = model.decode_latent(
                y_arr, n_time_per_chunk=n_time_per_chunk
            )
        decoding_res_l.append(decoding_res)
    return {
        k: np.array([np.asarray(d[k]) for d in decoding_res_l])
        for k in decoding_res_l[0].keys()
        if np.asarray(decoding_res_l[0][k]).ndim > 0
    }
