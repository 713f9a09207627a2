

def test_cnn_denoiser_odd_resolution():
    """The U-Net must handle films whose dimensions are not divisible
    by 2^levels (avg_pool floors odd sizes; the decoder edge-pads
    back). 320x180 crashed before the fix: 180 -> 90 -> 45 -> 22
    upsamples to 44 != 45."""
    import numpy as np

    from rene_tpu.models.denoise import denoise

    rng = np.random.RandomState(0)
    h, w = 45, 52
    color = rng.rand(h, w, 3).astype(np.float32)
    normal = rng.rand(h, w, 3).astype(np.float32)
    albedo = rng.rand(h, w, 3).astype(np.float32)
    out = denoise(color, normal, albedo, method="cnn")
    assert out.shape == (h, w, 3)
    assert np.isfinite(out).all()
