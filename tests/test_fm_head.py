"""Feature-major train head (models.head.feature_major_head): same math as
SSDHead, emitted (k, A) with no transpose in the graph — the training twin
of the serving wire head. See the v5e numbers in its docstring."""

import jax
import jax.numpy as jnp
import numpy as np

from tpu_pillars.config import tiny_config
from tpu_pillars.models.head import SSDHead, feature_major_head

CFG = tiny_config()


def _head_and_feat(rng, batched):
    K, A_loc = CFG.num_classes, CFG.anchors_per_loc
    head = SSDHead(num_classes=K, anchors_per_loc=A_loc)
    hf, wf, c = CFG.grid_h // 2, CFG.grid_w // 2, 3 * CFG.rpn_up_channels
    shape = (2, hf, wf, c) if batched else (hf, wf, c)
    feat = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    variables = head.init(jax.random.PRNGKey(0), feat)
    return head, variables, feat


def test_feature_major_head_matches_ssd_head(rng):
    K, A_loc = CFG.num_classes, CFG.anchors_per_loc
    for batched in (False, True):
        head, variables, feat = _head_and_feat(rng, batched)
        out = head.apply(variables, feat)                # anchor-major
        cls_fm, box_fm, dir_fm = feature_major_head(
            variables["params"], feat, K, A_loc)

        ax = (0, 2, 1) if batched else (1, 0)
        np.testing.assert_allclose(
            np.asarray(cls_fm), np.asarray(out.cls_logits).transpose(ax),
            rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(box_fm), np.asarray(out.box_deltas).transpose(ax),
            rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(dir_fm), np.asarray(out.dir_logits).transpose(ax),
            rtol=1e-5, atol=1e-5)


def test_feature_major_head_grads_flow(rng):
    K, A_loc = CFG.num_classes, CFG.anchors_per_loc
    head, variables, feat = _head_and_feat(rng, False)

    def loss(params, feat):
        cls_fm, box_fm, dir_fm = feature_major_head(params, feat, K, A_loc)
        return (jnp.sum(cls_fm ** 2) + jnp.sum(box_fm ** 2)
                + jnp.sum(dir_fm ** 2))

    gp, gf = jax.grad(loss, argnums=(0, 1))(variables["params"], feat)
    for leaf in jax.tree.leaves(gp) + [gf]:
        assert np.isfinite(np.asarray(leaf)).all()
        assert float(jnp.abs(leaf).max()) > 0.0

    # grads of the matmul formulation match grads of the conv formulation
    def loss_conv(params, feat):
        out = head.apply({"params": params}, feat)
        return (jnp.sum(out.cls_logits ** 2) + jnp.sum(out.box_deltas ** 2)
                + jnp.sum(out.dir_logits ** 2))

    gp_c, gf_c = jax.grad(loss_conv, argnums=(0, 1))(variables["params"],
                                                     feat)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4),
        (gp, gf), (gp_c, gf_c))
