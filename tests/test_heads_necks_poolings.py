"""Head / pooling / classification+segmentation neck unit tests (reference
pattern: tests/additional_tests/models/{heads,necks}/* — forward shape +
torchscript conversion; here shape + jit, the jit being this framework's
compile-surface analog)."""
import jax
import jax.numpy as jnp
import pytest

import torchok_tpu  # noqa: F401
from torchok_tpu.constructor import HEADS, NECKS, POOLINGS

B = 2


def _init_apply(model, *args, train=False, jit=True):
    variables = model.init(jax.random.PRNGKey(0), *args, train)
    def run(v, *a):
        return model.apply(v, *a, train)
    if jit:
        run = jax.jit(run)
    return run(variables, *args)


class TestPoolings:
    @pytest.mark.parametrize("ptype,mult", [("avg", 1), ("max", 1),
                                            ("catavgmax", 2)])
    def test_pooling_types(self, ptype, mult):
        m = POOLINGS.get("Pooling")(in_channels=16, pooling_type=ptype)
        out = _init_apply(m, jnp.ones((B, 8, 8, 16)))
        assert out.shape == (B, 16 * mult)
        assert m.out_channels == 16 * mult

    def test_pooling_linear_projects(self):
        m = POOLINGS.get("PoolingLinear")(in_channels=16, out_channels=32)
        out = _init_apply(m, jnp.ones((B, 8, 8, 16)))
        assert out.shape == (B, 32)
        assert m.out_channels == 32


class TestHeads:
    def test_classification_head_shape(self):
        m = HEADS.get("ClassificationHead")(in_channels=32, num_classes=7)
        out = _init_apply(m, jnp.ones((B, 32)), None)
        assert out.shape == (B, 7)

    def test_classification_head_binary_squeeze(self):
        m = HEADS.get("ClassificationHead")(in_channels=32, num_classes=1)
        out = _init_apply(m, jnp.ones((B, 32)), None)
        assert out.shape == (B,)

    def test_linear_head_normalize(self):
        m = HEADS.get("LinearHead")(in_channels=32, out_channels=16,
                                    normalize=True)
        out = _init_apply(m, jnp.ones((B, 32)), None)
        assert out.shape == (B, 16)
        norms = jnp.linalg.norm(out, axis=-1)
        assert jnp.allclose(norms, 1.0, atol=1e-4)

    def test_arcface_margin_changes_target_logit(self):
        m = HEADS.get("ArcFaceHead")(in_channels=16, num_classes=5)
        x = jax.random.normal(jax.random.PRNGKey(1), (B, 16))
        t = jnp.asarray([1, 3])
        v = m.init({"params": jax.random.PRNGKey(0)}, x, t, True)
        train_out = m.apply(v, x, t, True,
                            mutable=["buffers"] if "buffers" in v else [])
        if isinstance(train_out, tuple):
            train_out = train_out[0]
        eval_out = m.apply(v, x, None, False)
        assert train_out.shape == eval_out.shape == (B, 5)
        # margin: the target-class logit is penalized in train mode
        assert float(train_out[0, 1]) < float(eval_out[0, 1]) + 1e-6

    def test_segmentation_head_upsamples_to_input(self):
        m = HEADS.get("SegmentationHead")(in_channels=24, num_classes=4)
        feats = [jnp.ones((B, 32, 32, 3)), jnp.ones((B, 8, 8, 24))]
        out = _init_apply(m, feats, None)
        assert out.shape == (B, 32, 32, 4)

    def test_ocr_head_train_emits_aux(self):
        m = HEADS.get("OCRSegmentationHead")(in_channels=24, num_classes=4)
        feats = [jnp.ones((B, 32, 32, 3)), jnp.ones((B, 8, 8, 24))]
        v = m.init(jax.random.PRNGKey(0), feats, None, True)
        out, _ = m.apply(v, feats, None, True, mutable=["batch_stats"],
                         rngs={"dropout": jax.random.PRNGKey(1)})
        # train mode returns (main, aux) logits for the two-term OCR loss
        if isinstance(out, (tuple, list)):
            assert out[0].shape == (B, 32, 32, 4)
        else:
            assert out.shape == (B, 32, 32, 4)


class TestNecks:
    def _pyramid(self, chans=(8, 16, 32), hw=32):
        feats = [jnp.ones((B, hw, hw, 3))]
        for i, c in enumerate(chans):
            s = 2 ** (i + 1)
            feats.append(jnp.ones((B, hw // s, hw // s, c)))
        return feats

    def test_hrnet_classification_neck(self):
        branches = [jnp.ones((B, 16, 16, 8)), jnp.ones((B, 8, 8, 16)),
                    jnp.ones((B, 4, 4, 32))]
        m = NECKS.get("HRNetClassificationNeck")(in_channels=(8, 16, 32))
        out = _init_apply(m, branches)
        assert out.ndim == 4 and out.shape[0] == B
        assert out.shape[-1] == m.out_channels

    def test_hrnet_segmentation_neck(self):
        # pyramid contract: [input] + the 4 HRNet branches
        feats = [jnp.ones((B, 32, 32, 3)),
                 jnp.ones((B, 16, 16, 8)), jnp.ones((B, 8, 8, 16)),
                 jnp.ones((B, 4, 4, 32)), jnp.ones((B, 2, 2, 64))]
        m = NECKS.get("HRNetSegmentationNeck")(in_channels=(8, 16, 32, 64))
        out = _init_apply(m, feats)
        # [input, fused]: branches upsampled to the finest resolution, fused
        assert out[-1].shape == (B, 16, 16, m.out_channels)
        assert m.out_channels == sum((8, 16, 32, 64))

    def test_unet_neck_decodes_to_stride_one(self):
        feats = self._pyramid()
        # decoder_channels sized to the 3-stage pyramid: 3 skips + input level
        m = NECKS.get("UnetNeck")(in_channels=(3, 8, 16, 32),
                                  decoder_channels=(32, 16, 8))
        out = _init_apply(m, feats)
        # [input, decoded]: back to input resolution, out_channels wide
        assert out[-1].shape == (B, 32, 32, m.out_channels)
