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
