"""Discovery operator tests: S1 listing classification, S3 path
construction, D2 rsync wrapper (injected runner), D1 FTP download
(fake ftplib), D4 idempotent dir recreate, A4 report render."""

from __future__ import annotations

import gzip
import os

import pytest

from ensembl_database_loader_spark.sources.discovery import (
    base_ftp_path,
    classify_ls_lines,
    ftp_download,
    ls_ftp_cwd,
    nfs_ftp_site_dir,
    prepare_target_dir,
    rsync_download,
)

LS_OUTPUT = [
    "drwxr-xr-x    2 ftp  ftp  4096 Jan 10 12:00 homo_sapiens_core_110_38",
    "drwxr-xr-x    2 ftp  ftp  4096 Jan 10 12:00 mus_musculus_core_110_39",
    "-rw-r--r--    1 ftp  ftp   123 Jan 10 12:00 README",
    "lrwxrwxrwx    1 ftp  ftp    11 Jan 10 12:00 current_link",
    "total 42",  # header noise: too few tokens after split? it has 2 -> skipped by mode check
]


def test_classify_ls_lines():
    out = classify_ls_lines(LS_OUTPUT)
    assert out.dirs == ["homo_sapiens_core_110_38", "mus_musculus_core_110_39"]
    assert out.files == ["README"]  # symlink is neither


class FakeFtp:
    """Minimal ftplib.FTP interface for S1/D1."""

    def __init__(self, listing, payloads):
        self._listing = listing
        self._payloads = payloads
        self.cwd_history = []

    def dir(self, cb):
        for line in self._listing:
            cb(line)

    def cwd(self, path):
        self.cwd_history.append(path)

    def nlst(self):
        return list(self._payloads)

    def retrbinary(self, cmd, write):
        name = cmd.split(" ", 1)[1]
        write(self._payloads[name])


def test_ls_ftp_cwd_with_fake():
    out = ls_ftp_cwd(FakeFtp(LS_OUTPUT, {}))
    assert out.dirs[0] == "homo_sapiens_core_110_38"


def test_base_ftp_path_variants():
    assert base_ftp_path(110) == "/pub/release-110/mysql"
    assert base_ftp_path(110, prerelease=True) == "/pub/.release-110/mysql"
    assert base_ftp_path(57, division="plants") == "/pub/release-57/plants/mysql"
    assert (
        nfs_ftp_site_dir("/nfs/ensemblftp/", 110) == "/nfs/ensemblftp/pub/release-110/mysql"
    )


def test_rsync_wrapper_builds_reference_cmd_and_raises():
    calls = []

    class P:
        def __init__(self, rc):
            self.returncode = rc
            self.stderr = "boom"

    def ok_runner(cmd, **kw):
        calls.append(cmd)
        return P(0)

    rsync_download("rsync://host/pub/db", "/tmp/x", runner=ok_runner)
    assert calls[0] == [
        "rsync", "--recursive", "--delete", "--quiet", "rsync://host/pub/db", "/tmp/x",
    ]  # DownloadDatabase.pm:133
    with pytest.raises(RuntimeError, match="rc=23"):
        rsync_download("rsync://h/p", "/tmp/x", runner=lambda cmd, **kw: P(23))


def test_ftp_download_writes_files(tmp_path):
    payloads = {"a.txt.gz": gzip.compress(b"row1"), "CHECKSUMS": b"1 1 a.txt.gz"}
    ftp = FakeFtp([], payloads)
    got = ftp_download(ftp, "/pub/release-110/mysql/db1", str(tmp_path))
    assert ftp.cwd_history == ["/pub/release-110/mysql/db1"]
    assert sorted(os.path.basename(p) for p in got) == ["CHECKSUMS", "a.txt.gz"]
    assert gzip.decompress(open(tmp_path / "a.txt.gz", "rb").read()) == b"row1"


def test_prepare_target_dir_retry_semantics(tmp_path):
    d = str(tmp_path / "dl")
    prepare_target_dir(d, attempt=0)
    (tmp_path / "dl" / "stale").write_text("x")
    with pytest.raises(FileExistsError):
        prepare_target_dir(d, attempt=0)  # first attempt: collision throws
    prepare_target_dir(d, attempt=1)  # retry: wiped + recreated
    assert os.listdir(d) == []


def test_render_report(spark):
    from ensembl_database_loader_spark.pipeline import render_report
    from ensembl_database_loader_spark.pipeline.mirror import JobResult, MirrorReport

    rep = MirrorReport(
        results=[
            JobResult("db_a", "verify", "DONE"),
            JobResult("db_a", "load", "DONE"),
            JobResult("db_b", "verify", "FAILED", 1, "checksum mismatch"),
        ]
    )
    text = render_report(rep.to_df(spark))
    assert "verify: 1 succeeded, 1 failed" in text
    assert "load: 1 succeeded, 0 failed" in text
    assert "db_b / verify: checksum mismatch" in text
