import jax.numpy as jnp
import numpy as np

from viewcrafter_tpu.geometry import trajectory as T
from viewcrafter_tpu.geometry import transforms as X


def random_pose(rng):
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    w, x, y, z = q
    R = np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )
    P = np.eye(4)
    P[:3, :3] = R
    P[:3, 3] = rng.normal(size=3)
    return P


def test_inv_se3_matches_linalg():
    rng = np.random.default_rng(0)
    P = np.stack([random_pose(rng) for _ in range(5)])
    got = np.asarray(X.inv_se3(jnp.asarray(P)))
    np.testing.assert_allclose(got, np.linalg.inv(P), atol=1e-5)


def test_geotrf_matches_manual():
    rng = np.random.default_rng(1)
    P = random_pose(rng)
    pts = rng.normal(size=(10, 3))
    got = np.asarray(X.geotrf(jnp.asarray(P), jnp.asarray(pts)))
    expect = (P[:3, :3] @ pts.T).T + P[:3, 3]
    np.testing.assert_allclose(got, expect, atol=1e-5)


def test_world_point_to_kth_moves_kth_to_identity():
    rng = np.random.default_rng(2)
    poses = jnp.asarray(np.stack([random_pose(rng) for _ in range(3)]), jnp.float32)
    pts = jnp.asarray(rng.normal(size=(3, 4, 5, 3)), jnp.float32)
    new_poses, new_pts = X.world_point_to_kth(poses, pts, 1)
    np.testing.assert_allclose(np.asarray(new_poses[1]), np.eye(4), atol=1e-5)
    # points transform consistently: world point in cam-k frame
    expect = np.asarray(X.geotrf(X.inv_se3(poses[1]), pts.reshape(3, -1, 3))).reshape(3, 4, 5, 3)
    np.testing.assert_allclose(np.asarray(new_pts), expect, atol=1e-5)


def test_depth_unprojection_roundtrip():
    K = jnp.asarray([[100.0, 0, 32], [0, 100.0, 24], [0, 0, 1]])
    depth = jnp.full((48, 64), 2.0)
    pts = X.depthmap_to_pts3d(depth, K)
    # integer pixel grid (dust3r xy_grid convention): exact center is 0
    np.testing.assert_allclose(np.asarray(pts[24, 32]), [0.0, 0.0, 2.0], atol=1e-5)
    # reproject
    u = 100.0 * pts[..., 0] / pts[..., 2] + 32
    np.testing.assert_allclose(np.asarray(u[0]), np.arange(64) + 0.0, atol=1e-4)


def test_sphere2pose_identity():
    anchor = np.eye(4, dtype=np.float32)
    out = T.sphere2pose(anchor, 0.0, 0.0, 0.0)
    np.testing.assert_allclose(out, anchor, atol=1e-7)
    # r shifts camera along +z of world
    out_r = T.sphere2pose(anchor, 0.0, 0.0, 0.5)
    np.testing.assert_allclose(out_r[2, 3], 0.5, atol=1e-7)
    # phi=90 about y maps z-offset onto x axis
    out_p = T.sphere2pose(anchor, 0.0, 90.0, 0.5)
    np.testing.assert_allclose(out_p[:3, 3], [0.5, 0, 0], atol=1e-6)


def test_rotate_theta_full_circle():
    rng = np.random.default_rng(3)
    poses = np.stack([random_pose(rng)]).astype(np.float32)
    out = T.rotate_theta(poses, theta=30.0, phi=360.0, r=2.0)
    np.testing.assert_allclose(out, poses, atol=1e-4)


def test_txt_interpolation_endpoints():
    vals = [0.0, 10.0, -5.0, 3.0, 8.0]
    out = T.txt_interpolation(vals, 25, "smooth")
    assert out.shape == (25,)
    lin = T.txt_interpolation([0.0, 1.0], 9, "linear")
    np.testing.assert_allclose(lin, np.linspace(0, 1, 9), atol=1e-9)


def test_generate_traj_specified_ramp():
    anchor = np.eye(4, dtype=np.float32)
    anchor[2, 3] = 2.0  # anchor sits 2 units along z
    traj = T.generate_traj_specified(anchor, d_theta=10.0, d_phi=30.0, d_r=-0.2, d_x=0, d_y=0, frames=25)
    assert traj.shape == (25, 4, 4)
    np.testing.assert_allclose(traj[0], anchor, atol=1e-6)
    # last pose differs
    assert np.abs(traj[-1] - anchor).max() > 0.01


def test_interp_traj_counts_and_endpoints():
    rng = np.random.default_rng(4)
    # three keyframes, looking roughly along +z
    keys = []
    for i in range(3):
        P = np.eye(4)
        P[:3, 3] = [i * 1.0, 0.1 * i, -2.0]
        keys.append(P)
    keys = np.stack(keys).astype(np.float32)
    out = T.interp_traj(keys, n_inserts=13)
    assert out.shape == ((13 - 1) * 2 + 1, 4, 4)
    np.testing.assert_allclose(out[-1], keys[-1], atol=1e-5)
    # interpolated positions stay near the keyframe segment
    assert np.abs(out[:, :3, 3]).max() < 5.0


def test_interpolate_sequence():
    out = T.interpolate_sequence(np.array([0.0, 2.0]), n_inserts=3)
    assert len(out) == 5
    np.testing.assert_allclose(out, [0.0, 0.5, 1.0, 1.5, 2.0], atol=1e-6)


def test_focus_point():
    # two cameras at +-x looking at origin -> focus point ~ origin
    def lookat(pos):
        z = -pos / np.linalg.norm(pos)
        x = np.cross([0, 1, 0], z)
        x = x / np.linalg.norm(x)
        y = np.cross(z, x)
        P = np.eye(4)
        P[:3, 0], P[:3, 1], P[:3, 2], P[:3, 3] = x, y, z, pos
        return P

    c2ws = np.stack([lookat(np.array([2.0, 0, 0])), lookat(np.array([0, 0, 2.0]))])
    fp = T.focus_point_fn(c2ws)
    np.testing.assert_allclose(fp, 0.0, atol=1e-6)
