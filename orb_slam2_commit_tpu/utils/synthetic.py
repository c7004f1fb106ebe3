"""Synthetic scene rendering for tests and benchmarks.

The environment has no TUM/KITTI/EuRoC data (zero egress), so correctness
is validated on synthetic sequences with exact ground truth: a cloud of 3D
landmarks, each rendered as a small random-texture patch (distinctive BRIEF
descriptors, strong FAST corners), splatted with bilinear subpixel accuracy
into images along a known camera trajectory. This mirrors the reference's
validation-by-dataset-run strategy (SURVEY.md §4) but with closed-form
ground truth for ATE checks.

Host-side NumPy; test-only code, not on the TPU hot path.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import numpy as np

from orb_slam2_commit_tpu.utils.config import CameraConfig


@dataclasses.dataclass
class Scene:
    points: np.ndarray       # [P, 3] world coords
    patches: np.ndarray      # [P, S, S] float32 textures (0..255)
    patch_half: int


def make_scene(
    rng: np.random.Generator,
    n_points: int = 500,
    depth_range: Tuple[float, float] = (4.0, 12.0),
    spread: float = 6.0,
    patch_size: int = 15,
    planar_frac: float = 0.0,
) -> Scene:
    """Random landmark cloud in front of the origin (+z forward).

    Each landmark's texture = high-contrast random blocks + a strong
    directional ramp. The ramp dominates the intensity centroid so the ORB
    orientation is stable across views (small random textures alone have
    near-symmetric moments and flip orientation, which no real-world corner
    does)."""
    z = rng.uniform(*depth_range, size=n_points)
    x = rng.uniform(-spread, spread, size=n_points)
    y = rng.uniform(-spread * 0.75, spread * 0.75, size=n_points)
    points = np.stack([x, y, z], axis=-1)
    if planar_frac > 0.0:
        # Put the first fraction of landmarks on a tilted "ground" plane
        # (for plane-anchored AR demos, slam/ar.py).
        k = int(n_points * planar_frac)
        nrm = np.array([0.1, 1.0, -0.15])
        nrm /= np.linalg.norm(nrm)
        anchor = np.array([0.0, spread * 0.5, np.mean(depth_range)])
        d = -nrm @ anchor
        pts = points[:k]
        points[:k] = pts - ((pts @ nrm + d)[:, None]) * nrm[None, :]

    # Patch design for stable SLAM features:
    # - one dominant bright disc at the center -> a single strong FAST
    #   corner per landmark, so detection/selection repeats across frames;
    # - random medium-contrast block texture around it -> distinctive BRIEF;
    # - a directional ramp -> stable intensity-centroid orientation.
    s = max(patch_size, 17)
    half = s // 2
    tex = rng.uniform(0.0, 255.0, size=(n_points, s, s))
    tex = np.where(tex > 127.5, 165.0, 55.0)
    theta = rng.uniform(0, 2 * np.pi, n_points)
    yy, xx = np.mgrid[0:s, 0:s].astype(np.float64)
    yc, xc = (yy - half) / half, (xx - half) / half
    ramp = (
        np.cos(theta)[:, None, None] * xc[None]
        + np.sin(theta)[:, None, None] * yc[None]
    )
    patches = np.clip(tex + 35.0 * ramp, 0.0, 255.0)
    r2 = (yy - half) ** 2 + (xx - half) ** 2
    disc = r2 <= 2.5 ** 2
    patches[:, disc] = 250.0
    return Scene(points=points.astype(np.float64),
                 patches=patches.astype(np.float32),
                 patch_half=half)


def _distort_np(xn: float, yn: float, cam: CameraConfig):
    """Radial-tangential distortion on one normalized coordinate (NumPy
    mirror of ops/camera.distort_normalized; oracle: the OpenCV model the
    reference's settings assume, src/Tracking.cc:53-117)."""
    r2 = xn * xn + yn * yn
    radial = 1.0 + r2 * (cam.k1 + r2 * (cam.k2 + r2 * cam.k3))
    xd = xn * radial + 2.0 * cam.p1 * xn * yn + cam.p2 * (r2 + 2.0 * xn * xn)
    yd = yn * radial + cam.p1 * (r2 + 2.0 * yn * yn) + 2.0 * cam.p2 * xn * yn
    return xd, yd


def _aa_blur(img: np.ndarray, sigma: float = 0.7) -> np.ndarray:
    """Separable 5-tap Gaussian anti-aliasing (stabilizes BRIEF bits under
    subpixel motion, like real camera optics/PSF do)."""
    x = np.arange(-2, 3, dtype=np.float64)
    k = np.exp(-(x * x) / (2 * sigma * sigma))
    k /= k.sum()
    pad = np.pad(img, ((0, 0), (2, 2)), mode="edge")
    img = sum(k[i] * pad[:, i : i + img.shape[1]] for i in range(5))
    pad = np.pad(img, ((2, 2), (0, 0)), mode="edge")
    return sum(k[i] * pad[i : i + img.shape[0], :] for i in range(5)).astype(
        np.float32
    )


@dataclasses.dataclass
class Photometry:
    """Per-frame photometric degradation: the reference's operating point
    is real camera imagery — its extractor exists to survive sensor noise
    and exposure swings (two-threshold FAST fallback,
    src/ORBextractor.cc:892-915; Gaussian blur before BRIEF :1190). This
    model adds the dominant effects so accuracy numbers are measured on
    non-sterile renders:

      * read noise: additive Gaussian, `noise_sigma` gray levels;
      * shot noise: Gaussian with sigma = shot_noise * sqrt(I/255),
        brighter pixels noisier (Poisson approximation);
      * exposure: per-frame gain in `gain_range` (x) and bias in
        `bias_range` (gray levels), drawn uniformly — auto-exposure hunt;
      * motion blur: directional blur along the inter-frame image flow,
        length = motion_blur_frac * |flow| px capped at
        motion_blur_max_px (shutter open that fraction of frame time).

    All draws are per-frame-index seeded, so resumed drives and repeated
    renders see identical degradation."""

    noise_sigma: float = 0.0
    shot_noise: float = 0.0
    gain_range: Tuple[float, float] = (1.0, 1.0)
    bias_range: Tuple[float, float] = (0.0, 0.0)
    motion_blur_frac: float = 0.0
    motion_blur_max_px: float = 6.0


# A moderate "real camera" operating point for tests: sigma=3 gray
# levels read noise, sqrt-scaled shot noise, +/-20% exposure gain swing.
CAMERA_PHOTO = Photometry(
    noise_sigma=3.0, shot_noise=2.0, gain_range=(0.8, 1.2),
    bias_range=(-6.0, 6.0),
)


def _shift_sample(img: np.ndarray, dx: float, dy: float) -> np.ndarray:
    """Bilinear sample of img at (x+dx, y+dy), edge-clamped."""
    h, w = img.shape
    x0 = int(np.floor(dx))
    y0 = int(np.floor(dy))
    fx, fy = dx - x0, dy - y0

    def sh(ix, iy):
        xs = np.clip(np.arange(w) + ix, 0, w - 1)
        ys = np.clip(np.arange(h) + iy, 0, h - 1)
        return img[np.ix_(ys, xs)]

    return ((1 - fx) * (1 - fy) * sh(x0, y0) + fx * (1 - fy) * sh(x0 + 1, y0)
            + (1 - fx) * fy * sh(x0, y0 + 1) + fx * fy * sh(x0 + 1, y0 + 1))


def _motion_blur(img: np.ndarray, flow: np.ndarray, length: float) -> np.ndarray:
    """Directional blur: average of samples along `flow` direction over
    `length` pixels (linear shutter-integration approximation, uniform
    over the frame — valid for the mostly-rigid flow of these scenes)."""
    if length < 0.5:
        return img
    n = max(int(np.ceil(length)) + 1, 2)
    d = flow / max(np.linalg.norm(flow), 1e-9)
    offs = np.linspace(-0.5 * length, 0.5 * length, n)
    acc = np.zeros_like(img)
    for o in offs:
        acc += _shift_sample(img, d[0] * o, d[1] * o)
    return (acc / n).astype(np.float32)


def apply_photometry(
    img: np.ndarray,
    photo: Optional["Photometry"],
    seed: int,
    frame_idx: int,
    flow_px: Optional[np.ndarray] = None,
    noise_stream: int = 0,
) -> np.ndarray:
    """Degrade one rendered frame. `noise_stream` decorrelates the noise
    of stereo left/right views while keeping gain/bias shared (real rigs
    slave the right camera's exposure to the left's)."""
    if photo is None:
        return img
    rng = np.random.default_rng([seed, 7919, frame_idx])
    gain = rng.uniform(*photo.gain_range)
    bias = rng.uniform(*photo.bias_range)
    out = img.astype(np.float32)
    if photo.motion_blur_frac > 0.0 and flow_px is not None:
        length = min(
            photo.motion_blur_frac * float(np.linalg.norm(flow_px)),
            photo.motion_blur_max_px,
        )
        out = _motion_blur(out, np.asarray(flow_px, np.float64), length)
    out = gain * out + bias
    if photo.noise_sigma > 0.0 or photo.shot_noise > 0.0:
        nrng = np.random.default_rng([seed, 104729, frame_idx, noise_stream])
        sigma = np.sqrt(
            photo.noise_sigma ** 2
            + photo.shot_noise ** 2 * np.clip(out, 0.0, 255.0) / 255.0
        )
        out = out + sigma * nrng.standard_normal(out.shape)
    return np.clip(out, 0.0, 255.0).astype(np.float32)


def _flow_px(
    cam: CameraConfig,
    R_prev: np.ndarray, t_prev: np.ndarray,
    R_cur: np.ndarray, t_cur: np.ndarray,
    depth: float = 9.0,
) -> np.ndarray:
    """Image-space displacement of the point `depth` m straight ahead of
    the PREVIOUS camera between the two frames — the blur direction and
    magnitude a real shutter would integrate."""
    p_world = R_prev.T @ (np.array([0.0, 0.0, depth]) - t_prev)
    pc = R_cur @ p_world + t_cur
    if pc[2] < 0.1:
        return np.zeros(2)
    u1 = np.array([cam.fx * pc[0] / pc[2] + cam.cx,
                   cam.fy * pc[1] / pc[2] + cam.cy])
    u0 = np.array([cam.fx * 0.0 + cam.cx, cam.fy * 0.0 + cam.cy])
    return u1 - u0


def render(
    scene: Scene,
    R_cw: np.ndarray,
    t_cw: np.ndarray,
    cam: CameraConfig,
    background: float = 96.0,
    with_depth: bool = False,
    max_depth: float = np.inf,
):
    """Render image [H, W] float32 from camera pose (world -> camera).
    With with_depth=True also returns a depth map (0 where no landmark —
    the invalid-depth convention of TUM RGB-D). max_depth culls landmarks
    beyond it — an opaque-wall surrogate for scenes that surround the
    camera (ring_scene), where the sprite renderer would otherwise draw
    the far side through the near wall."""
    h, w = cam.height, cam.width
    img = np.full((h, w), background, dtype=np.float32)
    depth = np.zeros((h, w), dtype=np.float32)
    pc = scene.points @ R_cw.T + t_cw
    z = pc[:, 2]
    # Vectorized visibility pre-cull (city-block drive scenes carry 10^4-10^5
    # landmarks; the splat loop must only touch the in-frustum few hundred).
    vis = (z >= 0.5) & (z <= max_depth)
    order = np.where(vis)[0]
    order = order[np.argsort(-z[order])]  # far first: near draws on top
    half = scene.patch_half
    s = 2 * half + 1
    for i in order:
        xn, yn = pc[i, 0] / z[i], pc[i, 1] / z[i]
        if cam.has_distortion:
            # Lens model: the raw image is DISTORTED (the pipeline
            # undistorts keypoints after extraction, reference
            # src/Frame.cc:471-506) — splat landmarks at their distorted
            # pixel position. Patch-local warp is negligible at patch
            # scale.
            xn, yn = _distort_np(xn, yn, cam)
        u = cam.fx * xn + cam.cx
        v = cam.fy * yn + cam.cy
        if not (half + 2 <= u < w - half - 2 and half + 2 <= v < h - half - 2):
            continue
        u0, v0 = int(np.floor(u)), int(np.floor(v))
        fu, fv = u - u0, v - v0
        # Bilinear splat of the patch at subpixel offset (fu, fv).
        p = scene.patches[i]
        top = v0 - half
        left = u0 - half
        block = img[top : top + s + 1, left : left + s + 1]
        w00 = (1 - fu) * (1 - fv)
        w10 = fu * (1 - fv)
        w01 = (1 - fu) * fv
        w11 = fu * fv
        acc = np.zeros((s + 1, s + 1), dtype=np.float32)
        wgt = np.zeros((s + 1, s + 1), dtype=np.float32)
        acc[:s, :s] += w00 * p
        wgt[:s, :s] += w00
        acc[:s, 1:] += w10 * p
        wgt[:s, 1:] += w10
        acc[1:, :s] += w01 * p
        wgt[1:, :s] += w01
        acc[1:, 1:] += w11 * p
        wgt[1:, 1:] += w11
        mask = wgt > 1e-6
        block[mask] = acc[mask] / np.maximum(wgt[mask], 1e-6)
        depth[top : top + s + 1, left : left + s + 1][mask] = z[i]
    img = _aa_blur(img)
    if with_depth:
        return img, depth
    return img


def look_ahead_trajectory(
    n_frames: int,
    step: float = 0.06,
    lateral_amp: float = 0.25,
    yaw_amp: float = 0.02,
) -> List[Tuple[np.ndarray, np.ndarray]]:
    """Forward-dominant trajectory with gentle sway; returns camera-from-world
    (R_cw, t_cw) per frame. Camera starts at origin looking +z."""
    poses = []
    for k in range(n_frames):
        # Camera center in world coords.
        c = np.array(
            [
                lateral_amp * np.sin(2.0 * np.pi * k / max(n_frames - 1, 1)),
                0.05 * np.sin(4.0 * np.pi * k / max(n_frames - 1, 1)),
                step * k,
            ]
        )
        yaw = yaw_amp * np.sin(2.0 * np.pi * k / max(n_frames - 1, 1))
        cy, sy = np.cos(yaw), np.sin(yaw)
        R_wc = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
        R_cw = R_wc.T
        t_cw = -R_cw @ c
        poses.append((R_cw, t_cw))
    return poses


def sweep_trajectory(
    n_frames: int,
    amp: float = 0.35,
    z_step: float = 0.005,
    yaw_amp: float = 0.12,
    periods: float = 1.25,
) -> List[Tuple[np.ndarray, np.ndarray]]:
    """TUM-fr1/xyz-like handheld motion: lateral-dominant sinusoidal sweep
    with gentle vertical bob, slow forward drift and a yaw that keeps the
    scene centered. Lateral translation against a near scene gives strong
    per-frame parallax — the geometry real mono SLAM accuracy claims are
    made on (the reference's ATE tables are TUM fr1/xyz-class sequences,
    README.md:39-45) — unlike a pure forward march where parallax vanishes
    toward the epipole."""
    poses = []
    for k in range(n_frames):
        ph = 2.0 * np.pi * periods * k / max(n_frames - 1, 1)
        c = np.array([
            amp * np.sin(ph),
            0.35 * amp * np.sin(2.1 * ph + 0.7),
            z_step * k,
        ])
        # Yaw counter-rotates so the optical axis sweeps back over the scene.
        yaw = -yaw_amp * np.sin(ph)
        cy, sy = np.cos(yaw), np.sin(yaw)
        R_wc = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
        R_cw = R_wc.T
        t_cw = -R_cw @ c
        poses.append((R_cw, t_cw))
    return poses


def render_sequence(
    cam: CameraConfig,
    n_frames: int = 30,
    n_points: int = 500,
    seed: int = 0,
    step: float = 0.06,
    with_depth: bool = False,
    planar_frac: float = 0.0,
    motion: str = "forward",
    depth_range: Tuple[float, float] = (4.0, 12.0),
    spread: float = 6.0,
    photo: Optional[Photometry] = None,
):
    """Images [T, H, W] + ground-truth poses + scene
    (+ depth maps [T, H, W] when with_depth).

    motion="forward": the original forward march (adverse mono geometry —
    low parallax near the epipole; stress test). motion="sweep": lateral
    handheld sweep against the scene (TUM fr1/xyz-class geometry; use
    depth_range=(1.5, 4.0), spread~2.0 with it)."""
    rng = np.random.default_rng(seed)
    scene = make_scene(
        rng, n_points=n_points, planar_frac=planar_frac,
        depth_range=depth_range, spread=spread,
    )
    if motion == "sweep":
        # amp chosen so the PEAK per-frame camera translation equals `step`
        # (d/dk of amp*sin(2*pi*p*k/(n-1)) has max amp*2*pi*p/(n-1)) —
        # "step" keeps one meaning across motion modes.
        periods = 1.25
        amp = step * (n_frames - 1) / (2.0 * np.pi * periods)
        poses = sweep_trajectory(n_frames, amp=amp, periods=periods)
    else:
        poses = look_ahead_trajectory(n_frames, step=step)
    def degrade(img, k):
        flow = None
        if photo is not None and photo.motion_blur_frac > 0.0 and k > 0:
            flow = _flow_px(cam, *poses[k - 1], *poses[k],
                            depth=float(np.mean(depth_range)))
        return apply_photometry(img, photo, seed, k, flow_px=flow)

    if with_depth:
        rendered = [render(scene, R, t, cam, with_depth=True) for R, t in poses]
        images = np.stack(
            [degrade(r[0], k) for k, r in enumerate(rendered)]
        )
        depths = np.stack([r[1] for r in rendered])
        return images, poses, scene, depths
    images = np.stack(
        [degrade(render(scene, R, t, cam), k)
         for k, (R, t) in enumerate(poses)]
    )
    return images, poses, scene


def ring_scene(
    rng: np.random.Generator,
    n_points: int = 700,
    center: np.ndarray = None,
    radius_range: Tuple[float, float] = (6.0, 12.0),
    height: float = 2.5,
    patch_size: int = 15,
) -> Scene:
    """Landmark annulus surrounding a closed camera path (KITTI-00-class
    loop geometry): points distributed over all azimuths at
    radius_range from `center`, so a camera circling inside with
    tangential heading sees a different sector at every angle — and the
    SAME sector when it returns. Patch texture identical to make_scene."""
    if center is None:
        center = np.zeros(3)
    # Jittered (azimuth, height) grid instead of uniform draws: the sprite
    # renderer splats every landmark at a fixed pixel size, so clustered
    # landmarks overlap and their boundary intersections out-respond the
    # real corners; near-even spacing keeps the extracted features on the
    # actual landmarks.
    n_az = int(np.ceil(np.sqrt(n_points * 8)))
    n_h = -(-n_points // n_az)
    az_idx, h_idx = np.meshgrid(np.arange(n_az), np.arange(n_h))
    az_idx = az_idx.reshape(-1)[:n_points]
    h_idx = h_idx.reshape(-1)[:n_points]
    phi = (az_idx + rng.uniform(0.15, 0.85, n_points)) * (2.0 * np.pi / n_az)
    y_g = (h_idx + rng.uniform(0.15, 0.85, n_points)) / n_h
    rad = rng.uniform(*radius_range, n_points)
    x = center[0] + rad * np.sin(phi)
    z = center[2] + rad * np.cos(phi)
    y = center[1] + (2.0 * y_g - 1.0) * height
    points = np.stack([x, y, z], axis=-1)

    proto = make_scene(rng, n_points=n_points, patch_size=patch_size)
    return Scene(points=points.astype(np.float64),
                 patches=proto.patches, patch_half=proto.patch_half)


def loop_trajectory(
    n_frames: int,
    radius: float = 2.0,
    frac: float = 1.25,
) -> List[Tuple[np.ndarray, np.ndarray]]:
    """Closed circular survey with tangential heading: the camera starts
    at the origin looking +z, drives a circle of `radius` (center at
    (radius, 0, 0)) and — with frac > 1 — re-traverses the first sectors
    after completing the revolution, revisiting its own keyframes with
    whatever drift tracking accumulated. Returns (R_cw, t_cw) per frame."""
    poses = []
    for k in range(n_frames):
        th = 2.0 * np.pi * frac * k / max(n_frames - 1, 1)
        c = np.array([radius * (1.0 - np.cos(th)), 0.0, radius * np.sin(th)])
        cy, sy = np.cos(th), np.sin(th)
        R_wc = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
        R_cw = R_wc.T
        t_cw = -R_cw @ c
        poses.append((R_cw, t_cw))
    return poses


def render_loop_sequence(
    cam: CameraConfig,
    n_frames: int = 120,
    n_points: int = 900,
    seed: int = 0,
    radius: float = 2.0,
    frac: float = 1.2,
    radius_range: Tuple[float, float] = (7.0, 9.0),
    max_depth: float = 12.0,
    photo: Optional[Photometry] = None,
):
    """Images + ground-truth poses + scene for a loop-closure sequence:
    ring_scene around the circular path of loop_trajectory, far side of
    the ring occluded (max_depth) like an opaque wall would."""
    rng = np.random.default_rng(seed)
    scene = ring_scene(
        rng, n_points=n_points, center=np.array([radius, 0.0, 0.0]),
        radius_range=radius_range,
    )
    poses = loop_trajectory(n_frames, radius=radius, frac=frac)
    images = np.stack([
        apply_photometry(
            render(scene, R, t, cam, max_depth=max_depth), photo, seed, k,
            flow_px=(_flow_px(cam, *poses[k - 1], *poses[k])
                     if photo is not None and photo.motion_blur_frac > 0.0
                     and k > 0 else None),
        )
        for k, (R, t) in enumerate(poses)
    ])
    return images, poses, scene


def drive_path(theta: np.ndarray, r0: float = 40.0, lobe: float = 0.18):
    """Closed city-block circuit: radius-modulated ring r(th) = r0 *
    (1 + lobe cos 4th) — four smooth "corners" with elevated yaw rate
    (KITTI-00-class loop geometry with rotation-heavy segments).
    Returns centers [M, 3] (y = 0 plane)."""
    r = r0 * (1.0 + lobe * np.cos(4.0 * theta))
    return np.stack(
        [r * np.sin(theta), np.zeros_like(theta), r * np.cos(theta)], -1
    )


def drive_scene(
    rng: np.random.Generator,
    n_points: int = 40000,
    r0: float = 40.0,
    lobe: float = 0.18,
    lateral_range: Tuple[float, float] = (4.0, 11.0),
    height: float = 3.0,
    patch_size: int = 11,
) -> Scene:
    """Street-canyon landmark field along the drive_path circuit:
    landmarks in bands on BOTH sides of the street (building walls),
    jittered near-even along arc length so the sprite features stay
    distinct. Scales to 10^4-10^5 landmarks (the KITTI-class map-size
    regime, reference Examples/Stereo/stereo_kitti.cc:29-166)."""
    n_side = n_points // 2
    # Near-even arc placement with jitter (see ring_scene rationale).
    th = (np.arange(n_side) + rng.uniform(0.1, 0.9, n_side)) * (
        2.0 * np.pi / n_side
    )
    centers = drive_path(th, r0, lobe)
    # In-plane outward normal (radial direction is a good approximation
    # for small lobe).
    nrm = np.stack([np.sin(th), np.zeros_like(th), np.cos(th)], -1)
    out_pts = centers + nrm * rng.uniform(*lateral_range, n_side)[:, None]
    th2 = (np.arange(n_points - n_side) + rng.uniform(
        0.1, 0.9, n_points - n_side
    )) * (2.0 * np.pi / (n_points - n_side))
    centers2 = drive_path(th2, r0, lobe)
    nrm2 = np.stack([np.sin(th2), np.zeros_like(th2), np.cos(th2)], -1)
    in_pts = centers2 - nrm2 * rng.uniform(
        *lateral_range, n_points - n_side
    )[:, None]
    points = np.concatenate([out_pts, in_pts])
    points[:, 1] = rng.uniform(-height, height, n_points)

    proto = make_scene(rng, n_points=n_points, patch_size=patch_size)
    return Scene(points=points.astype(np.float64),
                 patches=proto.patches, patch_half=proto.patch_half)


def drive_trajectory(
    n_frames: int,
    r0: float = 40.0,
    lobe: float = 0.18,
    frac: float = 1.18,
) -> List[Tuple[np.ndarray, np.ndarray]]:
    """Tangential-heading survey around drive_path; frac > 1 re-traverses
    the opening sector, closing the loop at the end of the drive (the
    KITTI-00 revisit structure). Returns (R_cw, t_cw) per frame."""
    poses = []
    th = np.linspace(0.0, 2.0 * np.pi * frac, n_frames)
    c = drive_path(th, r0, lobe)
    # Tangent via finite differences -> yaw heading.
    fwd = np.gradient(c, axis=0)
    for k in range(n_frames):
        f = fwd[k] / max(np.linalg.norm(fwd[k]), 1e-9)
        yaw = np.arctan2(f[0], f[2])
        cy, sy = np.cos(yaw), np.sin(yaw)
        R_wc = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
        R_cw = R_wc.T
        t_cw = -R_cw @ c[k]
        poses.append((R_cw, t_cw))
    return poses


def drive_frames(
    cam: CameraConfig,
    n_frames: int = 1600,
    n_points: int = 40000,
    seed: int = 0,
    r0: float = 40.0,
    lobe: float = 0.18,
    frac: float = 1.18,
    max_depth: float = 16.0,
    stereo: bool = False,
    photo: Optional[Photometry] = None,
):
    """Lazy generator of (index, image) — or (index, left, right) with
    stereo=True, right camera displaced by cam.baseline — for the
    KITTI-class drive, plus the ground-truth poses and scene. Images are
    rendered on demand (a pre-rendered 1600-frame f32 stack is ~2 GB)."""
    rng = np.random.default_rng(seed)
    scene = drive_scene(rng, n_points=n_points, r0=r0, lobe=lobe)
    poses = drive_trajectory(n_frames, r0=r0, lobe=lobe, frac=frac)
    b = cam.baseline if stereo else 0.0

    def frames(start=0):
        # `start` supports checkpoint-resumed drives (scripts/scale_drive.py):
        # poses are analytic and photometric draws are per-frame-seeded,
        # so skipping ahead reproduces the exact same frames.
        for k in range(start, len(poses)):
            R, t = poses[k]
            flow = None
            if photo is not None and photo.motion_blur_frac > 0.0 and k > 0:
                flow = _flow_px(cam, *poses[k - 1], *poses[k])
            left = render(scene, R, t, cam, max_depth=max_depth)
            left = apply_photometry(left, photo, seed, k, flow_px=flow)
            if stereo:
                right = render(
                    scene, R, t - np.array([b, 0.0, 0.0]), cam,
                    max_depth=max_depth,
                )
                right = apply_photometry(
                    right, photo, seed, k, flow_px=flow, noise_stream=1
                )
                yield k, left, right
            else:
                yield k, left

    return frames, poses, scene


def figure8_path(s: np.ndarray, r: float = 25.0):
    """Figure-eight street circuit in the x-z plane: lobe A is the circle
    of radius r centered at (r, 0, 0), lobe B the circle centered at
    (-r, 0, 0); both pass through the origin with a +z tangent, so the
    path crosses itself there with tangent continuity. `s` in [0, 4*pi):
    s in [0, 2*pi) traverses lobe A, [2*pi, 4*pi) lobe B; beyond 4*pi it
    re-enters lobe A. Each completed lobe returns the camera to the
    origin after a full lap of drift — the multi-loop-closure geometry
    (KITTI 00 closes several loops, reference src/KeyFrame.cc:532-543)."""
    s = np.asarray(s, np.float64) % (4.0 * np.pi)
    on_a = s < 2.0 * np.pi
    u = np.where(on_a, s, s - 2.0 * np.pi)
    xa = r - r * np.cos(u)
    xb = -r + r * np.cos(u)
    x = np.where(on_a, xa, xb)
    z = r * np.sin(u)
    return np.stack([x, np.zeros_like(x), z], -1)


def figure8_trajectory(
    n_frames: int,
    r: float = 25.0,
    laps: float = 2.15,
) -> List[Tuple[np.ndarray, np.ndarray]]:
    """Tangential-heading survey of the figure-eight: `laps` in lobe
    units (2.15 = lobe A + lobe B + 15% re-entry of lobe A, giving two
    origin returns with a third revisit for post-closure tracking).
    Returns (R_cw, t_cw) per frame."""
    svals = np.linspace(0.0, 2.0 * np.pi * laps, n_frames)
    c = figure8_path(svals, r)
    fwd = np.gradient(c, axis=0)
    poses = []
    for k in range(n_frames):
        f = fwd[k] / max(np.linalg.norm(fwd[k]), 1e-9)
        yaw = np.arctan2(f[0], f[2])
        cy, sy = np.cos(yaw), np.sin(yaw)
        R_wc = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
        R_cw = R_wc.T
        t_cw = -R_cw @ c[k]
        poses.append((R_cw, t_cw))
    return poses


def figure8_scene(
    rng: np.random.Generator,
    n_points: int = 60000,
    r: float = 25.0,
    lateral_range: Tuple[float, float] = (4.0, 11.0),
    height: float = 3.0,
    patch_size: int = 11,
) -> Scene:
    """Street-canyon landmarks along both lobes of the figure-eight:
    bands on each side of the path, jittered near-even along arc length
    (same design as drive_scene)."""
    n_lobe = n_points // 2
    pts = []
    for sign, n_l in ((1.0, n_lobe), (-1.0, n_points - n_lobe)):
        n_side = n_l // 2
        for side, n_s in ((1.0, n_side), (-1.0, n_l - n_side)):
            u = (np.arange(n_s) + rng.uniform(0.1, 0.9, n_s)) * (
                2.0 * np.pi / n_s
            )
            cx = sign * (r - r * np.cos(u))
            cz = sign * r * np.sin(u)
            # Outward radial normal from the lobe's center (sign*r, 0).
            nx = cx - sign * r
            nz = cz
            nn = np.sqrt(nx * nx + nz * nz) + 1e-9
            off = side * rng.uniform(*lateral_range, n_s)
            pts.append(np.stack([
                cx + off * nx / nn,
                rng.uniform(-height, height, n_s),
                cz + off * nz / nn,
            ], -1))
    points = np.concatenate(pts)
    proto = make_scene(rng, n_points=n_points, patch_size=patch_size)
    return Scene(points=points.astype(np.float64),
                 patches=proto.patches, patch_half=proto.patch_half)


def figure8_frames(
    cam: CameraConfig,
    n_frames: int = 1400,
    n_points: int = 60000,
    seed: int = 0,
    r: float = 25.0,
    laps: float = 2.15,
    max_depth: float = 12.0,
    stereo: bool = False,
    photo: Optional[Photometry] = None,
):
    """Lazy frame generator for the figure-eight multi-loop drive (same
    contract as drive_frames, including resume via `start`)."""
    rng = np.random.default_rng(seed)
    scene = figure8_scene(rng, n_points=n_points, r=r)
    poses = figure8_trajectory(n_frames, r=r, laps=laps)
    b = cam.baseline if stereo else 0.0

    def frames(start=0):
        for k in range(start, len(poses)):
            R, t = poses[k]
            flow = None
            if photo is not None and photo.motion_blur_frac > 0.0 and k > 0:
                flow = _flow_px(cam, *poses[k - 1], *poses[k])
            left = render(scene, R, t, cam, max_depth=max_depth)
            left = apply_photometry(left, photo, seed, k, flow_px=flow)
            if stereo:
                right = render(
                    scene, R, t - np.array([b, 0.0, 0.0]), cam,
                    max_depth=max_depth,
                )
                right = apply_photometry(
                    right, photo, seed, k, flow_px=flow, noise_stream=1
                )
                yield k, left, right
            else:
                yield k, left

    return frames, poses, scene


def render_stereo_sequence(
    cam: CameraConfig,
    n_frames: int = 30,
    n_points: int = 500,
    seed: int = 0,
    step: float = 0.06,
    photo: Optional[Photometry] = None,
):
    """Rectified stereo pairs: right camera displaced by the baseline along
    the camera x-axis (t_right = t_left - [b, 0, 0] in camera coords)."""
    rng = np.random.default_rng(seed)
    scene = make_scene(rng, n_points=n_points)
    poses = look_ahead_trajectory(n_frames, step=step)
    b = cam.baseline
    lefts, rights = [], []
    for k, (R, t) in enumerate(poses):
        flow = None
        if photo is not None and photo.motion_blur_frac > 0.0 and k > 0:
            flow = _flow_px(cam, *poses[k - 1], *poses[k])
        lefts.append(apply_photometry(
            render(scene, R, t, cam), photo, seed, k, flow_px=flow))
        rights.append(apply_photometry(
            render(scene, R, t - np.array([b, 0.0, 0.0]), cam),
            photo, seed, k, flow_px=flow, noise_stream=1))
    return np.stack(lefts), np.stack(rights), poses, scene
