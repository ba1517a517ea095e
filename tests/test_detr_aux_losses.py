"""DETR deep supervision (mmdet return_intermediate parity): every decoder
layer's output runs through the shared heads and contributes its own
Hungarian-matched loss terms, tagged with the mmdet ``d{i}.`` prefix."""
import jax
import jax.numpy as jnp
import numpy as np

from torchok_tpu.constructor import HEADS


def _build(num_layers=3, return_intermediate=True):
    head = HEADS.get("DETRHead")(
        num_classes=2, in_channels=16, embed_dim=32, num_queries=6,
        num_heads=2, num_encoder_layers=1, num_decoder_layers=num_layers,
        ffn_dim=64, return_intermediate=return_intermediate)
    feats = [jnp.ones((2, 8, 8, 16), jnp.float32)]
    variables = head.init(jax.random.PRNGKey(0), feats, False)
    return head, variables, feats


def test_call_returns_decoder_layer_stack():
    head, variables, feats = _build(num_layers=3)
    cls, bbox = head.apply(variables, feats, False)
    assert cls.shape == (3, 2, 6, 3)   # (Lyr, B, Q, C+1)
    assert bbox.shape == (3, 2, 6, 4)

    head1, v1, _ = _build(num_layers=3, return_intermediate=False)
    cls1, bbox1 = head1.apply(v1, feats, False)
    assert cls1.shape == (1, 2, 6, 3)


def test_aux_losses_tagged_per_layer():
    head, variables, feats = _build(num_layers=3)
    cls, bbox = head.apply(variables, feats, False)

    class FakeJoint:
        def __call__(self, **kw):
            total = jnp.sum(kw["cls_scores"] ** 2) * 0 + 1.0
            return total, {"loss_cls": total}

    gt_bboxes = jnp.asarray([[[4.0, 4.0, 20.0, 20.0]]] * 2)
    gt_labels = jnp.asarray([[0]] * 2)
    total, tagged = head.loss(FakeJoint(), cls, bbox, gt_bboxes, gt_labels,
                              img_shape=(64, 64))
    assert float(total) == 3.0  # one unit per decoder layer
    assert set(tagged) == {"d0.loss_cls", "d1.loss_cls", "loss_cls"}


def test_get_bboxes_uses_last_layer():
    head, variables, feats = _build(num_layers=2)
    cls, bbox = head.apply(variables, feats, False)
    out_stack = head.get_bboxes(cls, bbox, img_shape=(64, 64))
    out_last = head.get_bboxes(cls[-1], bbox[-1], img_shape=(64, 64))
    np.testing.assert_allclose(np.asarray(out_stack["bboxes"]),
                               np.asarray(out_last["bboxes"]))
    np.testing.assert_allclose(np.asarray(out_stack["scores"]),
                               np.asarray(out_last["scores"]))
