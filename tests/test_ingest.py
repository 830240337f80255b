"""Ingestion stage: XML camera parsing, action-name mapping, pose loading
(npz path), full ingest() over a synthetic raw tree, idempotency
(reference src/datasets/read_human_36m.py)."""

import pickle

import numpy as np
import pytest

from h36x.data.ingest import (
    ACTION_NAMES,
    N_CAMS,
    N_SUBJECTS,
    ingest,
    read_action_name,
    read_cam_parameters,
    read_poses,
)
from h36x.geometry.camera import rotation_matrix_xyz
from h36x.geometry.skeleton import H36M_RAW_JOINT_IDS


def _write_metadata_xml(path, rng):
    """Synthetic metadata.xml with the real w0/mapping structure."""
    ext = rng.normal(size=(N_CAMS * N_SUBJECTS * 6,))
    intr = rng.normal(size=(N_CAMS * 9,)) + 2.0
    w0_tokens = ["["] if False else []
    vals = np.concatenate([ext, intr])
    body = " ".join(str(v) for v in vals)
    body = "[" + body.split(" ", 1)[0] + " " + body.split(" ", 1)[1] + "]"

    rows = []
    for action_no in range(2, 17):  # mapping uses action_no+1
        for trial in (1, 2):
            names = "".join(
                f"<c{su}>Seq_{action_no}_{trial}_S{su}</c{su}>"
                for su in range(1, N_SUBJECTS + 1)
            )
            rows.append(
                f"<tr><a>{action_no}</a><b>{trial}</b>{names}</tr>"
            )
    xml = f"<root><w0>{body}</w0><mapping>{''.join(rows)}</mapping></root>"
    path.write_text(xml)
    return ext, intr


class TestCameraParsing:
    def test_extrinsics_and_intrinsics_slots(self, tmp_path, rng):
        ext, intr = _write_metadata_xml(tmp_path / "metadata.xml", rng)
        sbj, cam = 3, 2
        rt, t, f, c, k = read_cam_parameters(str(tmp_path / "metadata.xml"), sbj, cam)

        start = ((cam - 1) * N_SUBJECTS + (sbj - 1)) * 6
        np.testing.assert_allclose(rt, rotation_matrix_xyz(ext[start : start + 3]))
        np.testing.assert_allclose(t, ext[start + 3 : start + 6])

        istart = (cam - 1) * 9
        np.testing.assert_allclose(f, intr[istart : istart + 2])
        np.testing.assert_allclose(c, intr[istart + 2 : istart + 4])
        d = intr[istart + 4 : istart + 9]
        # packed (k1,k2,p1,p2,k3) from metadata order (k1,k2,k3,p1,p2)
        np.testing.assert_allclose(k, [d[0], d[1], d[3], d[4], d[2]])

    def test_action_name_lookup(self, tmp_path, rng):
        _write_metadata_xml(tmp_path / "metadata.xml", rng)
        name = read_action_name(str(tmp_path / "metadata.xml"), sbj_id=5,
                                action_no=1, trial_no=2)
        assert name == "Seq_2_2_S5"
        assert read_action_name(str(tmp_path / "metadata.xml"), 1, 99, 1) is None


class TestReadPoses:
    def test_npz_sibling_of_cdf(self, tmp_path, rng):
        n = 7
        flat = rng.normal(size=(1, n, 32 * 3)).astype(np.float32)
        np.savez_compressed(tmp_path / "seq.npz", Pose=flat)
        out = read_poses(str(tmp_path / "seq.cdf"), is_3d=True)
        assert out.shape == (n, 17, 3)
        want = flat[0].reshape(n, 32, 3)[:, np.asarray(H36M_RAW_JOINT_IDS)]
        np.testing.assert_allclose(out, want, rtol=1e-6)

    def test_2d_shape(self, tmp_path, rng):
        flat = rng.normal(size=(1, 4, 64)).astype(np.float32)
        np.savez_compressed(tmp_path / "p.npz", Pose=flat)
        out = read_poses(str(tmp_path / "p.npz"))
        assert out.shape == (4, 17, 2)

    def test_cdf_without_spacepy_raises(self, tmp_path):
        (tmp_path / "x.cdf").write_bytes(b"notacdf")
        with pytest.raises(RuntimeError, match="spacepy"):
            read_poses(str(tmp_path / "x.cdf"))


@pytest.fixture
def raw_tree(tmp_path, rng):
    """Minimal raw H36M layout for one subject, one action, both trials."""
    _write_metadata_xml(tmp_path / "metadata.xml", rng)
    sbj = 1
    for trial in (1, 2):
        for action_no in (2,):  # mapping action_no=2 -> action_id 1
            seq = f"Seq_{action_no}_{trial}_S{sbj}"
            vids = tmp_path / f"S{sbj}" / "Videos"
            p2 = tmp_path / f"S{sbj}" / "MyPoseFeatures" / "D2_Positions"
            p3 = tmp_path / f"S{sbj}" / "MyPoseFeatures" / "D3_Positions_mono"
            for d in (vids, p2, p3):
                d.mkdir(parents=True, exist_ok=True)
            for cam in range(1, 5):
                (vids / f"{seq}.{cam}.mp4").write_bytes(b"fakemp4")
                np.savez_compressed(
                    p2 / f"{seq}.{cam}.npz",
                    Pose=rng.normal(size=(1, 10, 64)).astype(np.float32),
                )
                (p2 / f"{seq}.{cam}.cdf").write_bytes(b"")
                np.savez_compressed(
                    p3 / f"{seq}.{cam}.npz",
                    Pose=rng.normal(size=(1, 10, 96)).astype(np.float32),
                )
                (p3 / f"{seq}.{cam}.cdf").write_bytes(b"")
    return tmp_path


class TestIngest:
    def test_full_tree(self, raw_tree, tmp_path):
        out = tmp_path / "out"
        n = ingest(str(raw_tree), str(out), subjects=[1], actions=[1],
                   verbose=False)
        assert n == 8  # 1 subject x 1 action x 2 trials x 4 cams

        for trial0 in (0, 1):
            base = out / "S1" / f"{ACTION_NAMES[0]}_{trial0}"
            assert (base / "orig_seq_name.txt").exists()
            for cam0 in range(4):
                cdir = base / f"cam_{cam0}"
                with open(cdir / "camera_wext.pkl", "rb") as f:
                    cam = pickle.load(f)
                assert set(cam) == {"f", "c", "k", "rt", "t"}
                with open(cdir / "gt_poses.pkl", "rb") as f:
                    gt = pickle.load(f)
                assert np.asarray(gt["2d"]).shape == (10, 17, 2)
                assert np.asarray(gt["3d"]).shape == (10, 17, 3)
                mp4s = list(cdir.glob("*.mp4"))
                assert len(mp4s) == 1 and mp4s[0].is_symlink()

    def test_npz_only_tree_ingests(self, raw_tree, tmp_path):
        """A tree holding ONLY pre-converted .npz poses (cdf_to_npz run on a
        spacepy machine, CDFs not shipped — the documented zero-egress
        workflow) must ingest identically to the .cdf tree: read_poses
        always supported the siblings, but discovery only globbed *cdf
        (review finding, round 4)."""
        for cdf in raw_tree.rglob("*.cdf"):
            cdf.unlink()
        out = tmp_path / "out_npz"
        n = ingest(str(raw_tree), str(out), subjects=[1], actions=[1],
                   verbose=False)
        assert n == 8  # same 8 cells as the .cdf tree
        p2 = raw_tree / "S1" / "MyPoseFeatures" / "D2_Positions"
        base = out / "S1" / f"{ACTION_NAMES[0]}_0"
        for cam0, ident in ((0, "1"), (1, "2"), (2, "3"), (3, "4")):
            with open(base / f"cam_{cam0}" / "gt_poses.pkl", "rb") as f:
                got = pickle.load(f)
            src = np.load(p2 / f"Seq_2_1_S1.{ident}.npz")["Pose"]
            want2d = src[0].reshape(-1, 32, 2)[:, np.asarray(H36M_RAW_JOINT_IDS)]
            np.testing.assert_allclose(np.asarray(got["2d"]), want2d,
                                       rtol=1e-6)

    def test_interior_camera_gap_does_not_shift_assignment(self, raw_tree,
                                                           tmp_path):
        """Deleting camera 2's pose files must skip ONLY cam 2 — cams 3/4
        keep their own files. (Positional indexing of the sorted glob —
        the reference's pose2d_paths[cam_id-1], read_human_36m.py:390 —
        would silently hand cam 2's slot to cam 3's file and so on,
        geometrically corrupting every later camera.)"""
        p2 = raw_tree / "S1" / "MyPoseFeatures" / "D2_Positions"
        victim = "Seq_2_1_S1.2"
        (p2 / f"{victim}.cdf").unlink()
        (p2 / f"{victim}.npz").unlink()

        out = tmp_path / "out_gap"
        n = ingest(str(raw_tree), str(out), subjects=[1], actions=[1],
                   verbose=False)
        assert n == 7  # 8 cells minus the one with the missing camera

        base = out / "S1" / f"{ACTION_NAMES[0]}_0"
        assert not (base / "cam_1" / "gt_poses.pkl").exists()
        for cam0, ident in ((0, "1"), (2, "3"), (3, "4")):
            with open(base / f"cam_{cam0}" / "gt_poses.pkl", "rb") as f:
                got = pickle.load(f)
            src = np.load(p2 / f"Seq_2_1_S1.{ident}.npz")["Pose"]
            want2d = src[0].reshape(-1, 32, 2)[:, np.asarray(H36M_RAW_JOINT_IDS)]
            np.testing.assert_allclose(np.asarray(got["2d"]), want2d,
                                       rtol=1e-6)

    def test_fully_absent_camera_does_not_shift_serials(self, tmp_path, rng):
        """With official H36M serials, a camera whose files are ALL absent
        must not shift later cameras onto its slot: serial->cam_id is
        absolute, so cam_3/cam_4 keep their own poses + calibration."""
        from h36x.data.ingest import H36M_CAMERA_SERIALS

        _write_metadata_xml(tmp_path / "metadata.xml", rng)
        seq = "Seq_2_1_S1"
        vids = tmp_path / "S1" / "Videos"
        p2 = tmp_path / "S1" / "MyPoseFeatures" / "D2_Positions"
        p3 = tmp_path / "S1" / "MyPoseFeatures" / "D3_Positions_mono"
        for d in (vids, p2, p3):
            d.mkdir(parents=True)
        sources = {}
        for i, serial in enumerate(H36M_CAMERA_SERIALS):
            if i == 1:
                continue  # camera 2: video AND both pose files absent
            (vids / f"{seq}.{serial}.mp4").write_bytes(b"fakemp4")
            pose = rng.normal(size=(1, 10, 64)).astype(np.float32)
            np.savez_compressed(p2 / f"{seq}.{serial}.npz", Pose=pose)
            (p2 / f"{seq}.{serial}.cdf").write_bytes(b"")
            sources[serial] = pose
            np.savez_compressed(
                p3 / f"{seq}.{serial}.npz",
                Pose=rng.normal(size=(1, 10, 96)).astype(np.float32),
            )
            (p3 / f"{seq}.{serial}.cdf").write_bytes(b"")

        out = tmp_path / "out"
        n = ingest(str(tmp_path), str(out), subjects=[1], actions=[1],
                   trials=(1,), verbose=False)
        assert n == 3
        base = out / "S1" / f"{ACTION_NAMES[0]}_0"
        assert not (base / "cam_1").exists()  # skipped, no littered dir
        for cam0, serial in ((0, H36M_CAMERA_SERIALS[0]),
                             (2, H36M_CAMERA_SERIALS[2]),
                             (3, H36M_CAMERA_SERIALS[3])):
            with open(base / f"cam_{cam0}" / "gt_poses.pkl", "rb") as f:
                got = pickle.load(f)
            want2d = sources[serial][0].reshape(-1, 32, 2)[
                :, np.asarray(H36M_RAW_JOINT_IDS)]
            np.testing.assert_allclose(np.asarray(got["2d"]), want2d,
                                       rtol=1e-6)

    def test_empty_subjects_means_nothing(self, raw_tree, tmp_path):
        """subjects=[] ingests NOTHING (only None means 'all') — a filtered
        empty list must not silently kick off a full-dataset ingest."""
        out = tmp_path / "out_empty"
        assert ingest(str(raw_tree), str(out), subjects=[], verbose=False) == 0
        assert ingest(str(raw_tree), str(out), subjects=[1], actions=[],
                      verbose=False) == 0
        assert not out.exists() or not any(out.iterdir())

    def test_idempotent(self, raw_tree, tmp_path):
        out = tmp_path / "out"
        ingest(str(raw_tree), str(out), subjects=[1], actions=[1], verbose=False)
        gt = out / "S1" / f"{ACTION_NAMES[0]}_0" / "cam_0" / "gt_poses.pkl"
        mtime = gt.stat().st_mtime_ns
        ingest(str(raw_tree), str(out), subjects=[1], actions=[1], verbose=False)
        assert gt.stat().st_mtime_ns == mtime  # skip-if-exists

    def test_cli_requires_dirs_and_runs(self, raw_tree, tmp_path, capsys):
        """h36x-ingest entry point: --source-dir/--out-dir are mandatory,
        and a real run over the synthetic tree reports the cell count
        (reference run_read_h36m.sh drives read_human_36m.py:36-43)."""
        from h36x.cli.ingest import main

        with pytest.raises(SystemExit):
            main([])
        out = tmp_path / "out_cli"
        main(["--source-dir", str(raw_tree), "--out-dir", str(out),
              "--subjects", "1"])
        assert "ingested 8" in capsys.readouterr().out
        assert (out / "S1").is_dir()

    def test_ingested_tree_feeds_clip_scanner(self, raw_tree, tmp_path):
        """L1 -> L2 contract: scan_clips consumes ingest() output."""
        from h36x.data.clips import scan_clips

        out = tmp_path / "out"
        ingest(str(raw_tree), str(out), subjects=[1], actions=[1], verbose=False)
        clips, gt_cache, cam_cache = scan_clips(
            str(out), subjects=[1], seq_len=4, stride=1, frame_skip=2
        )
        # 10 frames / skip 2 = 5 subsampled; windows of 4 at stride 1 -> 2 per video
        assert len(clips) == 2 * 8
        assert clips[0].cam_params["f"].shape == (2,)
