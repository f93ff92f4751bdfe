"""ConvQNetwork impl variants: the im2col torso must compute the same
function as the XLA-conv torso (weights converted), at MXU-friendly matmul
shapes (the reason it exists — see models/convnet.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from tetris_piclim_tpu.engine import OBS_DIM
from tetris_piclim_tpu.models.convnet import ConvQNetwork


def _convert_params(conv_params):
    """Conv_i HWIO kernels -> im2col Dense kernels (channel-major patch
    ordering of conv_general_dilated_patches)."""
    p = jax.tree.map(lambda a: a, conv_params)  # deep-ish copy
    out = {"params": {}}
    for name, leaf in conv_params["params"].items():
        if name.startswith("Conv_"):
            k = leaf["kernel"]  # [3, 3, cin, cout]
            dense_name = name.replace("Conv_", "Dense_")
            out["params"][dense_name] = {
                "kernel": k.transpose(2, 0, 1, 3).reshape(-1, k.shape[-1]),
                "bias": leaf["bias"],
            }
    # non-torso Dense layers shift indices: conv impl names them Dense_0..,
    # im2col names them Dense_<n_torso>..
    n_torso = sum(1 for n in conv_params["params"] if n.startswith("Conv_"))
    for name, leaf in conv_params["params"].items():
        if name.startswith("Dense_"):
            i = int(name.split("_")[1])
            out["params"][f"Dense_{i + n_torso}"] = leaf
    return out


def test_im2col_matches_conv():
    key = jax.random.PRNGKey(0)
    obs = jax.random.uniform(jax.random.PRNGKey(1), (32, OBS_DIM))
    for dueling, joint in [(False, False), (True, True)]:
        conv = ConvQNetwork(dueling=dueling, joint=joint, impl="conv")
        im2 = ConvQNetwork(dueling=dueling, joint=joint, impl="im2col")
        cp = conv.init(key, obs[:1])
        ip = im2.init(key, obs[:1])
        # same param count, different layout
        assert sum(a.size for a in jax.tree.leaves(cp)) == sum(
            a.size for a in jax.tree.leaves(ip)
        )
        converted = _convert_params(cp)
        # layouts must agree leaf-for-leaf with a real im2col init
        assert jax.tree.structure(converted) == jax.tree.structure(ip)
        y_conv = conv.apply(cp, obs)
        y_im2 = im2.apply(converted, obs)
        np.testing.assert_allclose(
            np.asarray(y_conv), np.asarray(y_im2), rtol=1e-5, atol=1e-5
        )
