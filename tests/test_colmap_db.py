"""COLMAP sqlite database export: schema, pair-id encoding, blob roundtrip,
pixel-center convention; readable by the reference's bundled database
module when present."""
import sqlite3

import numpy as np
import pytest

import conftest

from onepose_tpu.utils import colmap_db


def test_pair_id_encoding():
    assert colmap_db.pair_id_of(1, 2) == 1 * (2 ** 31 - 1) + 2
    assert colmap_db.pair_id_of(2, 1) == colmap_db.pair_id_of(1, 2)


def test_database_roundtrip(tmp_path):
    db_path = str(tmp_path / "database.db")
    db = colmap_db.ColmapDatabase(db_path)
    cam = db.add_camera("PINHOLE", 640, 480, [500.0, 501.0, 320.0, 240.0],
                        camera_id=1)
    i1 = db.add_image("a.png", cam, image_id=1)
    i2 = db.add_image("b.png", cam, image_id=2)
    kpts = np.array([[10.0, 20.0], [30.0, 40.0]], np.float32)
    db.add_keypoints(i1, kpts)
    db.add_keypoints(i2, kpts + 1)
    matches = np.array([[0, 1], [1, 0]])
    db.add_matches(i1, i2, matches)
    db.add_two_view_geometry(i1, i2, matches)
    db.close()

    conn = sqlite3.connect(db_path)
    rows, cols, data = conn.execute(
        "SELECT rows, cols, data FROM keypoints WHERE image_id=1"
    ).fetchone()
    got = np.frombuffer(data, np.float32).reshape(rows, cols)
    np.testing.assert_allclose(got, kpts + 0.5)  # pixel-center shift

    pid, mrows, mcols, mdata = conn.execute(
        "SELECT pair_id, rows, cols, data FROM matches").fetchone()
    assert pid == colmap_db.pair_id_of(1, 2)
    m = np.frombuffer(mdata, np.uint32).reshape(mrows, mcols)
    np.testing.assert_array_equal(m, matches)

    n_tvg = conn.execute(
        "SELECT COUNT(*) FROM two_view_geometries").fetchone()[0]
    assert n_tvg == 1
    conn.close()


def test_reference_database_module_reads_ours(tmp_path):
    """The reference's bundled COLMAP database helper must be able to open
    and extend our database (schema compatibility)."""
    if not conftest.reference_available():
        pytest.skip("reference not present")
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_db", "/root/reference/src/utils/colmap/database.py")
    ref_db = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_db)

    db_path = str(tmp_path / "database.db")
    db = colmap_db.ColmapDatabase(db_path)
    cam = db.add_camera("PINHOLE", 640, 480, [500.0, 500.0, 320.0, 240.0],
                        camera_id=1)
    db.add_image("a.png", cam, image_id=1)
    db.add_keypoints(1, np.array([[1.0, 2.0]], np.float32))
    db.close()

    ref = ref_db.COLMAPDatabase.connect(db_path)
    ref.create_tables()  # idempotent on a compatible schema
    names = [r[0] for r in ref.execute("SELECT name FROM images")]
    assert names == ["a.png"]
    kp = [r for r in ref.execute("SELECT rows, cols FROM keypoints")]
    assert kp == [(1, 2)]
    ref.close()


def test_export_database_from_h5(tmp_path):
    import sys
    import os.path as osp

    sys.path.insert(0, osp.dirname(__file__))
    from test_sfm import make_scene, write_fixture_h5

    rng = np.random.default_rng(0)
    pts3d, K, poses, uvs, perms = make_scene(rng, n_points=20, n_cams=4)
    names, feat_p, match_p, pair_list, Ks, poses_d, sizes = \
        write_fixture_h5(tmp_path, rng, pts3d, K, poses, uvs, perms)

    db_path = str(tmp_path / "database.db")
    name_to_id = colmap_db.export_database(
        feat_p, match_p, pair_list, Ks, sizes, None, db_path)
    assert len(name_to_id) == 4

    conn = sqlite3.connect(db_path)
    assert conn.execute("SELECT COUNT(*) FROM images").fetchone()[0] == 4
    assert conn.execute(
        "SELECT COUNT(*) FROM keypoints").fetchone()[0] == 4
    n_matches = conn.execute("SELECT COUNT(*) FROM matches").fetchone()[0]
    assert n_matches == len(pair_list)
    conn.close()


def test_two_view_geometries_full_rows(tmp_path):
    """Known-pose verification fills two_view_geometries with verified
    matches + F/E/relative-pose blobs; row shapes and pair-id encoding
    must match the reference's database module conventions."""
    import sys
    import os.path as osp

    sys.path.insert(0, osp.dirname(__file__))
    from test_sfm import make_scene, write_fixture_h5
    from onepose_tpu.sfm import triangulate

    rng = np.random.default_rng(1)
    pts3d, K, poses, uvs, perms = make_scene(rng, n_points=20, n_cams=4)
    names, feat_p, match_p, pair_list, Ks, poses_d, sizes = \
        write_fixture_h5(tmp_path, rng, pts3d, K, poses, uvs, perms)

    feats_uv, verified, geoms = triangulate.verify_matches(
        feat_p, match_p, pair_list, Ks, poses_d)
    assert geoms, "synthetic scene must produce verified pairs"

    db_path = str(tmp_path / "database.db")
    name_to_id = colmap_db.export_database(
        feat_p, match_p, pair_list, Ks, sizes, geoms, db_path)

    conn = sqlite3.connect(db_path)
    rows = conn.execute(
        "SELECT pair_id, rows, cols, data, config, F, E, qvec, tvec "
        "FROM two_view_geometries").fetchall()
    assert len(rows) == len(geoms)
    by_pair = {}
    for (n0, n1), g in geoms.items():
        pid = colmap_db.pair_id_of(name_to_id[n0], name_to_id[n1])
        by_pair[pid] = ((n0, n1), g)
    for pid, r, c, data, config, F, E, qvec, tvec in rows:
        assert pid in by_pair
        (n0, n1), g = by_pair[pid]
        assert config == 3  # CALIBRATED: E from known intrinsics
        m = np.frombuffer(data, np.uint32).reshape(r, c)
        expect = np.asarray(g["matches"], np.uint32)
        if name_to_id[n0] > name_to_id[n1]:
            expect = expect[:, ::-1]
        np.testing.assert_array_equal(m, expect)
        Fm = np.frombuffer(F, np.float64).reshape(3, 3)
        Em = np.frombuffer(E, np.float64).reshape(3, 3)
        np.testing.assert_allclose(Fm, g["F"], rtol=1e-10)
        np.testing.assert_allclose(Em, g["E"], rtol=1e-10)
        q = np.frombuffer(qvec, np.float64)
        t = np.frombuffer(tvec, np.float64)
        assert q.shape == (4,) and t.shape == (3,)
        np.testing.assert_allclose(np.linalg.norm(q), 1.0, atol=1e-9)

    # verified epipolar matches must satisfy x1^T F x0 ≈ 0 on the
    # noise-free synthetic scene
    (n0, n1), g = next(iter(by_pair.values()))
    uv0 = feats_uv[n0][g["matches"][:, 0]]
    uv1 = feats_uv[n1][g["matches"][:, 1]]
    x0 = np.concatenate([uv0, np.ones((len(uv0), 1))], axis=1)
    x1 = np.concatenate([uv1, np.ones((len(uv1), 1))], axis=1)
    resid = np.abs(np.einsum("ni,ij,nj->n", x1, g["F"], x0))
    line = x0 @ g["F"].T
    d = resid / np.linalg.norm(line[:, :2], axis=1)
    assert np.median(d) < 1.0
