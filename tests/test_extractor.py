"""ORB extraction tests against scalar NumPy oracles + synthetic images."""

import jax.numpy as jnp
import numpy as np
import pytest

from orb_slam2_commit_tpu.ops import descriptors, extractor, fast, pyramid
from orb_slam2_commit_tpu.utils.config import ORBConfig, synthetic_config
from orb_slam2_commit_tpu.utils import synthetic


def np_fast_corner_mask(img: np.ndarray, t: float) -> np.ndarray:
    """Scalar-oracle FAST-9/16 segment test (no NMS)."""
    h, w = img.shape
    offs = fast.CIRCLE_OFFSETS
    mask = np.zeros((h, w), dtype=bool)
    for y in range(3, h - 3):
        for x in range(3, w - 3):
            c = img[y, x]
            vals = np.array([img[y + dy, x + dx] for dy, dx in offs])
            for sign in (1, -1):
                above = sign * (vals - c) > t
                doubled = np.concatenate([above, above])
                run = 0
                best = 0
                for a in doubled:
                    run = run + 1 if a else 0
                    best = max(best, run)
                if best >= fast.ARC_LENGTH:
                    mask[y, x] = True
                    break
    return mask


class TestFAST:
    def test_segment_test_matches_oracle(self):
        rng = np.random.default_rng(0)
        img = rng.uniform(0, 255, size=(24, 24)).astype(np.float32)
        t = 20.0
        is_corner, _ = fast.fast_score_map(jnp.asarray(img), t)
        got = np.asarray(is_corner)
        want = np_fast_corner_mask(img, t)
        inner = np.s_[3:-3, 3:-3]
        np.testing.assert_array_equal(got[inner], want[inner])

    def test_bright_blob_is_corner(self):
        img = np.zeros((16, 16), dtype=np.float32)
        img[8, 8] = 200.0  # isolated bright pixel
        is_corner, score = fast.fast_score_map(jnp.asarray(img), 20.0)
        assert bool(is_corner[8, 8])
        assert float(score[8, 8]) > 0

    def test_flat_image_no_corners(self):
        img = np.full((32, 32), 128.0, dtype=np.float32)
        is_corner, _ = fast.fast_score_map(jnp.asarray(img), 7.0)
        assert not np.asarray(is_corner)[3:-3, 3:-3].any()

    def test_nms_keeps_single_maximum(self):
        score = np.zeros((16, 16), dtype=np.float32)
        score[5, 5] = 10.0
        score[5, 6] = 8.0  # neighbor, weaker
        score[10, 10] = 7.0  # isolated
        out = np.asarray(fast.nms_3x3(jnp.asarray(score)))
        assert out[5, 5] > 0
        assert out[5, 6] == 0
        assert out[10, 10] > 0

    def test_nms_plateau_single_survivor(self):
        score = np.zeros((16, 16), dtype=np.float32)
        score[5, 5] = 10.0
        score[5, 6] = 10.0  # tie
        out = np.asarray(fast.nms_3x3(jnp.asarray(score)))
        assert (out > 0).sum() == 1

    def test_select_keypoints_budget_and_border(self):
        rng = np.random.default_rng(1)
        score = rng.uniform(0, 1, size=(96, 128)).astype(np.float32)
        yx, resp, valid = fast.select_keypoints(
            jnp.asarray(score), 50, cell_size=32, cell_top_k=4, border=16
        )
        yx, resp, valid = map(np.asarray, (yx, resp, valid))
        assert yx.shape == (50, 2)
        assert valid.sum() > 0
        v = yx[valid]
        assert (v[:, 0] >= 16).all() and (v[:, 0] < 96 - 16).all()
        assert (v[:, 1] >= 16).all() and (v[:, 1] < 128 - 16).all()

    def test_select_keypoints_spatial_balance(self):
        # One hot cell should not monopolize the budget.
        score = np.zeros((64, 64), dtype=np.float32)
        score[20:28, 20:28] = np.random.default_rng(2).uniform(5, 10, (8, 8))
        score[40, 40] = 1.0
        yx, resp, valid = fast.select_keypoints(
            jnp.asarray(score), 20, cell_size=32, cell_top_k=4, border=4
        )
        yx, valid = np.asarray(yx), np.asarray(valid)
        # The weak but isolated corner must survive thanks to the cell cap.
        assert any((yx[valid] == [40, 40]).all(axis=1))
        assert valid.sum() <= 4 + 1


class TestOrientation:
    def test_gradient_patch_angle(self):
        # Intensity increasing with +x -> centroid to the right -> angle 0.
        img = np.tile(np.arange(64, dtype=np.float32), (64, 1))
        yx = jnp.asarray([[32, 32]], dtype=jnp.int32)
        ang = float(descriptors.ic_angle(jnp.asarray(img), yx)[0])
        assert abs(ang) < 0.05
        # Increasing with +y -> angle pi/2.
        ang2 = float(descriptors.ic_angle(jnp.asarray(img.T), yx)[0])
        assert abs(ang2 - np.pi / 2) < 0.05

    def test_matches_numpy_oracle(self):
        rng = np.random.default_rng(3)
        img = rng.uniform(0, 255, size=(64, 64)).astype(np.float32)
        pts = np.array([[20, 25], [31, 40], [16, 16]], dtype=np.int32)
        got = np.asarray(descriptors.ic_angle(jnp.asarray(img), jnp.asarray(pts)))
        umax = descriptors.circular_umax()
        for k, (y, x) in enumerate(pts):
            m01 = m10 = 0.0
            for dy in range(-15, 16):
                u = umax[abs(dy)]
                for dx in range(-u, u + 1):
                    val = img[y + dy, x + dx]
                    m10 += dx * val
                    m01 += dy * val
            want = np.arctan2(m01, m10)
            assert abs(got[k] - want) < 1e-4


class TestBRIEF:
    def test_deterministic_pattern(self):
        p1 = descriptors.brief_pattern()
        p2 = descriptors.brief_pattern()
        np.testing.assert_array_equal(p1, p2)
        assert p1.shape == (256, 2, 2)
        assert np.abs(p1).max() <= 13

    def test_same_patch_same_descriptor(self):
        rng = np.random.default_rng(4)
        patch = rng.uniform(0, 255, size=(48, 48)).astype(np.float32)
        img = np.full((128, 128), 100.0, dtype=np.float32)
        img[10:58, 10:58] = patch
        img[70:118, 60:108] = patch
        blurred = pyramid.gaussian_blur(jnp.asarray(img))
        yx = jnp.asarray([[34, 34], [94, 84]], dtype=jnp.int32)
        ang = jnp.zeros(2, dtype=jnp.float32)
        desc = np.asarray(descriptors.brief_descriptors(blurred, yx, ang))
        np.testing.assert_array_equal(desc[0], desc[1])

    def test_different_patches_far_apart(self):
        rng = np.random.default_rng(5)
        img = rng.uniform(0, 255, size=(128, 128)).astype(np.float32)
        blurred = pyramid.gaussian_blur(jnp.asarray(img))
        yx = jnp.asarray([[40, 40], [90, 90]], dtype=jnp.int32)
        ang = jnp.zeros(2, dtype=jnp.float32)
        desc = descriptors.brief_descriptors(blurred, yx, ang)
        bits = np.asarray(descriptors.unpack_bits(desc))
        dist = (bits[0] != bits[1]).sum()
        assert 70 < dist < 190  # random descriptors ~128 apart

    def test_rotation_steering(self):
        """A descriptor at angle theta on a rotated patch should match the
        descriptor of the unrotated patch at angle 0 (approximately)."""
        rng = np.random.default_rng(6)
        base = rng.uniform(0, 255, size=(96, 96)).astype(np.float32)
        base = np.asarray(pyramid.gaussian_blur(jnp.asarray(base), size=7, sigma=3.0))
        theta = np.deg2rad(30.0)
        # Rotate the image by -theta around (48, 48) with bilinear sampling.
        ys, xs = np.mgrid[0:96, 0:96].astype(np.float64)
        yc, xc = ys - 48, xs - 48
        ca, sa = np.cos(theta), np.sin(theta)
        xs_src = ca * xc - sa * yc + 48
        ys_src = sa * xc + ca * yc + 48
        x0 = np.clip(np.floor(xs_src).astype(int), 0, 94)
        y0 = np.clip(np.floor(ys_src).astype(int), 0, 94)
        fx, fy = xs_src - x0, ys_src - y0
        rot = (
            base[y0, x0] * (1 - fx) * (1 - fy)
            + base[y0, x0 + 1] * fx * (1 - fy)
            + base[y0 + 1, x0] * (1 - fx) * fy
            + base[y0 + 1, x0 + 1] * fx * fy
        ).astype(np.float32)
        yx = jnp.asarray([[48, 48]], dtype=jnp.int32)
        # Each view measures its own IC angle; steering by the measured angle
        # must normalize orientation (the invariance the pipeline relies on).
        a0 = descriptors.ic_angle(jnp.asarray(base), yx)
        a1 = descriptors.ic_angle(jnp.asarray(rot), yx)
        d0 = descriptors.brief_descriptors(jnp.asarray(base), yx, a0)
        d1 = descriptors.brief_descriptors(jnp.asarray(rot), yx, a1)
        bits0 = np.asarray(descriptors.unpack_bits(d0))[0]
        bits1 = np.asarray(descriptors.unpack_bits(d1))[0]
        dist = (bits0 != bits1).sum()
        assert dist < 60, dist  # steered match: far below random (~128)
        # And the measured angles should differ by ~theta (mod 2*pi).
        diff = float(a0[0] - a1[0])
        diff = (diff + np.pi) % (2 * np.pi) - np.pi
        assert abs(abs(diff) - theta) < 0.1, diff


class TestExtractor:
    def test_synthetic_image_extraction(self):
        cfg = synthetic_config(width=320, height=240, n_features=300)
        images, poses, scene = synthetic.render_sequence(
            cfg.camera, n_frames=1, n_points=150, seed=7
        )
        feats = extractor.extract_features(
            jnp.asarray(images[0]), cfg.orb, 240, 320
        )
        valid = np.asarray(feats.valid)
        assert valid.sum() > 80, f"only {valid.sum()} features"
        # Keypoints should sit near rendered landmarks.
        pc = scene.points @ poses[0][0].T + poses[0][1]
        uv = np.stack(
            [
                cfg.camera.fx * pc[:, 0] / pc[:, 2] + cfg.camera.cx,
                cfg.camera.fy * pc[:, 1] / pc[:, 2] + cfg.camera.cy,
            ],
            axis=-1,
        )
        xy = np.asarray(feats.xy)[valid]
        d = np.linalg.norm(xy[:, None, :] - uv[None, :, :], axis=-1).min(axis=1)
        assert np.median(d) < 6.0, np.median(d)

    def test_feature_budget_layout(self):
        cfg = ORBConfig(n_features=200, n_levels=4)
        budgets = cfg.features_per_level()
        assert len(budgets) == 4
        assert sum(budgets) == pytest.approx(200, abs=2)
        assert budgets[0] > budgets[1] > budgets[2]

    def test_shifted_image_shifts_keypoints(self):
        cfg = synthetic_config(width=256, height=192, n_features=200)
        img = synthetic.render_sequence(cfg.camera, 1, 100, seed=8)[0][0]
        shift = 4
        img2 = np.full_like(img, 96.0)
        img2[:, shift:] = img[:, :-shift]
        f1 = extractor.extract_features(jnp.asarray(img), cfg.orb, 192, 256)
        f2 = extractor.extract_features(jnp.asarray(img2), cfg.orb, 192, 256)
        xy1 = np.asarray(f1.xy)[np.asarray(f1.valid) & (np.asarray(f1.octave) == 0)]
        xy2 = np.asarray(f2.xy)[np.asarray(f2.valid) & (np.asarray(f2.octave) == 0)]
        # Most level-0 keypoints should reappear shifted by +shift in x.
        shifted = xy1 + np.array([shift, 0.0])
        d = np.linalg.norm(shifted[:, None] - xy2[None], axis=-1).min(axis=1)
        frac = (d < 1.0).mean()
        assert frac > 0.6, frac


class TestResize:
    def test_matmul_resize_matches_jax_image(self):
        """resize_bilinear is jax.image.resize('linear') re-expressed as
        two MXU matmuls; the operators must agree."""
        import jax

        rng = np.random.default_rng(7)
        for (hi, wi), (ho, wo) in [
            ((480, 640), (400, 533)),
            ((100, 77), (83, 64)),
            ((48, 64), (40, 53)),
        ]:
            img = jnp.asarray(rng.uniform(0, 255, (hi, wi)).astype(np.float32))
            ours = np.asarray(pyramid.resize_bilinear(img, (ho, wo)))
            ref = np.asarray(jax.image.resize(img, (ho, wo), method="linear"))
            np.testing.assert_allclose(ours, ref, atol=2e-2)
