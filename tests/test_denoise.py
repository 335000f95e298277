"""Feature-guided denoiser tests (render/denoise.py).

The reference has no denoiser (`finalGather` writes raw accumulator means,
`src/pathtrace.cu:439-444`); these tests pin the extension's contract:
the AOV pass reports correct first-hit features, the À-Trous filter is a
normalized convex combination (constants are fixed points, means are
preserved), it actually removes noise, it does NOT smear across geometric
edges or the hit/miss boundary, and end-to-end it buys several dB at a
fixed sample budget."""

import math
import os

import jax.numpy as jnp
import numpy as np
import pytest

from cosc_4397_pathtracing_raytracing_project_tpu import Renderer, RenderConfig
from cosc_4397_pathtracing_raytracing_project_tpu.render.denoise import (
    Aovs,
    atrous_denoise,
    denoise_image,
    render_aovs,
)
from cosc_4397_pathtracing_raytracing_project_tpu.scene import parse_scene
from cosc_4397_pathtracing_raytracing_project_tpu.scene.structs import Scene

HERE = os.path.dirname(__file__)
CORNELL = open(os.path.join(HERE, "..", "scenes", "cornell.txt")).read()
GOLDEN = open(os.path.join(HERE, "..", "scenes", "cornell_golden.txt")).read()


def _small(text, res=96):
    return Scene.from_desc(
        parse_scene(
            text.replace("RES         800 800", f"RES         {res} {res}")
        )
    )


def _flat_aovs(h, w, albedo=0.5):
    return Aovs(
        albedo=jnp.full((h, w, 3), albedo, jnp.float32),
        normal=jnp.broadcast_to(
            jnp.asarray([0.0, 0.0, 1.0], jnp.float32), (h, w, 3)
        ),
        depth=jnp.full((h, w), 5.0, jnp.float32),
        miss=jnp.zeros((h, w), bool),
    )


def _two_plane_aovs(h, w):
    """Left half faces +z, right half faces +x — a hard geometric edge."""
    nrm = np.zeros((h, w, 3), np.float32)
    nrm[:, : w // 2, 2] = 1.0
    nrm[:, w // 2 :, 0] = 1.0
    return Aovs(
        albedo=jnp.full((h, w, 3), 0.6, jnp.float32),
        normal=jnp.asarray(nrm),
        depth=jnp.full((h, w), 5.0, jnp.float32),
        miss=jnp.zeros((h, w), bool),
    )


class TestFilter:
    def test_constant_is_fixed_point(self):
        aovs = _flat_aovs(64, 64)
        img = jnp.full((64, 64, 3), 0.37, jnp.float32)
        out = np.asarray(atrous_denoise(img, aovs))
        np.testing.assert_allclose(out, np.asarray(img), atol=1e-5)

    def test_noise_removed_mean_preserved(self):
        # defirefly=False isolates the wavelet filter: it is a normalized
        # convex combination, so symmetric noise must average out with NO
        # mean shift (the firefly clamp, tested separately, trades a tiny
        # downward bias for outlier suppression)
        aovs = _flat_aovs(128, 128)
        rng = np.random.default_rng(7)
        img = np.clip(
            0.4 + rng.normal(0, 0.08, (128, 128, 3)), 0, None
        ).astype(np.float32)
        out = np.asarray(
            atrous_denoise(jnp.asarray(img), aovs, defirefly=False)
        )
        assert out.var() < img.var() / 20
        assert abs(out.mean() - img.mean()) < 2e-3

    def test_despeckle_kills_fireflies_keeps_regions(self):
        aovs = _flat_aovs(64, 64, albedo=1.0)
        img = np.full((64, 64, 3), 0.2, np.float32)
        img[10, 10] = 50.0  # isolated firefly
        img[30:32, 30:32] = 5.0  # genuine 2x2 bright region
        out = np.asarray(atrous_denoise(jnp.asarray(img), aovs))
        # the firefly is gone (clamped to its surroundings, then averaged)
        assert out[10, 10].max() < 1.0
        # the bright block still stands out (its pixels keep bright
        # neighbors; the color weight walls it off from the background)
        assert out[30:32, 30:32].min() > 2.0

    def test_output_is_convex_combination(self):
        # normalized weights: output range cannot exceed the input range
        aovs = _flat_aovs(64, 64)
        rng = np.random.default_rng(3)
        img = rng.uniform(0.2, 0.9, (64, 64, 3)).astype(np.float32)
        out = np.asarray(atrous_denoise(jnp.asarray(img), aovs))
        assert out.min() >= img.min() - 1e-5
        assert out.max() <= img.max() + 1e-5

    def test_normal_edge_not_smeared(self):
        h, w = 64, 64
        aovs = _two_plane_aovs(h, w)
        img = np.full((h, w, 3), 0.2, np.float32)
        img[:, w // 2 :] = 0.8  # illumination step aligned with the edge
        rng = np.random.default_rng(1)
        noisy = np.clip(
            img + rng.normal(0, 0.05, img.shape), 0, None
        ).astype(np.float32)
        out = np.asarray(atrous_denoise(jnp.asarray(noisy), aovs))
        # each side converges toward its own mean; the step survives
        left, right = out[:, : w // 2 - 1].mean(), out[:, w // 2 + 1 :].mean()
        assert abs(left - 0.2) < 0.02 and abs(right - 0.8) < 0.02
        assert right - left > 0.55

    def test_miss_boundary_not_smeared(self):
        # sky (miss) next to geometry: the weight classes must not mix
        h, w = 64, 64
        miss = np.zeros((h, w), bool)
        miss[:, : w // 2] = True
        nrm = np.zeros((h, w, 3), np.float32)
        nrm[..., 2] = 1.0
        aovs = Aovs(
            albedo=jnp.full((h, w, 3), 1.0, jnp.float32),
            normal=jnp.asarray(nrm),
            depth=jnp.asarray(np.where(miss, 0.0, 5.0).astype(np.float32)),
            miss=jnp.asarray(miss),
        )
        img = (
            np.where(miss[..., None], 1.0, 0.1)
            .astype(np.float32)
            .repeat(3, -1)
        )
        out = np.asarray(atrous_denoise(jnp.asarray(img), aovs))
        np.testing.assert_allclose(out, img, atol=1e-4)

    def test_albedo_detail_survives(self):
        # demodulation: a noise-free checkerboard TEXTURE under flat light
        # must pass through un-blurred even though the filter smooths hard
        h, w = 64, 64
        check = ((np.add.outer(np.arange(h), np.arange(w)) // 4) % 2).astype(
            np.float32
        )
        albedo = (0.2 + 0.6 * check)[..., None].repeat(3, -1)
        aovs = Aovs(
            albedo=jnp.asarray(albedo),
            normal=jnp.broadcast_to(
                jnp.asarray([0.0, 0.0, 1.0], jnp.float32), (h, w, 3)
            ),
            depth=jnp.full((h, w), 5.0, jnp.float32),
            miss=jnp.zeros((h, w), bool),
        )
        img = (albedo * 0.5).astype(np.float32)  # flat irradiance 0.5
        out = np.asarray(atrous_denoise(jnp.asarray(img), aovs))
        np.testing.assert_allclose(out, img, atol=1e-4)


class TestAovPass:
    def test_cornell_features(self):
        scene = _small(CORNELL, 96)
        aovs = render_aovs(scene)
        a = np.asarray(aovs.albedo)
        n = np.asarray(aovs.normal)
        d = np.asarray(aovs.depth)
        m = np.asarray(aovs.miss)
        # normals are unit everywhere (miss rows use the synthetic one)
        np.testing.assert_allclose(
            np.linalg.norm(n, axis=-1), 1.0, atol=1e-5
        )
        # center ray reaches the back wall (scene depth ~11); its albedo is
        # the white wall material
        assert not m[48, 48] and 9.0 < d[48, 48] < 13.0
        np.testing.assert_allclose(a[48, 48], [0.98, 0.98, 0.98], atol=1e-6)
        # green wall on one side, red on the other (mirror handled at save
        # time, not here)
        row = a[48]
        hit = ~m[48]
        assert (row[hit][:, 1] > 0.9).any() and (row[hit][:, 0] > 0.9).any()
        # misses carry the sentinel features
        if m.any():
            assert (d[m] == 0.0).all()
            np.testing.assert_allclose(a[m], 1.0)

    def test_mesh_scene_aovs(self):
        # triangle scenes route through the same pass (MT candidates are
        # chunk-capped); the terrain mesh fills the lower view, sky above
        import os

        from cosc_4397_pathtracing_raytracing_project_tpu.scene import (
            load_scene_desc,
        )

        path = os.path.join(HERE, "..", "scenes", "mesh1080p.txt")
        if not os.path.exists(
            os.path.join(HERE, "..", "scenes", "mesh_sphere.obj")
        ):
            pytest.skip("mesh OBJ fixtures not generated")
        desc = load_scene_desc(path)
        desc.camera.resolution = (48, 48)
        aovs = render_aovs(Scene.from_desc(desc))
        m = np.asarray(aovs.miss)
        d = np.asarray(aovs.depth)
        assert m.any() and (~m).any()  # both sky and terrain visible
        assert (d[~m] > 0).all()
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(aovs.normal), axis=-1), 1.0, atol=1e-4
        )

    def test_chunking_invariant(self):
        scene = _small(CORNELL, 64)
        full = render_aovs(scene, chunk=64 * 64)
        chunked = render_aovs(scene, chunk=512)
        # float AOVs may differ in the last ulp (chunk size changes XLA's
        # fusion); the discrete miss mask must be identical
        np.testing.assert_array_equal(
            np.asarray(full.miss), np.asarray(chunked.miss)
        )
        for x, y in zip(full[:3], chunked[:3]):
            np.testing.assert_allclose(
                np.asarray(x), np.asarray(y), atol=1e-5
            )


@pytest.mark.slow
def test_end_to_end_low_spp_gain():
    """The headline contract: at a fixed low sample budget on the golden
    Cornell, denoising buys several dB against a deeply-converged
    reference of the same configuration. (The TPU datum on the real
    800x800 golden: 25.06 -> 36.01 dB at 16 spp with NEE.)"""
    scene = _small(GOLDEN, 96)
    cfg = RenderConfig(
        samples_per_launch=16, antialias=True, sampler="sobol", nee=True
    )
    ref = Renderer(scene, cfg, seed=123)
    ref.render(192)
    ref_img = np.clip(ref.linear_image(), 0, 1)

    lo = Renderer(scene, cfg, seed=0)
    lo.render(16)
    raw = np.clip(lo.linear_image(), 0, 1)
    den = np.clip(denoise_image(lo), 0, 1)

    def psnr(x):
        return 10 * math.log10(1.0 / float(((x - ref_img) ** 2).mean()))

    p_raw, p_den = psnr(raw), psnr(den)
    assert p_den > p_raw + 3.0, (p_raw, p_den)
