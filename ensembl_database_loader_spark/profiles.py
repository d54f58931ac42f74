"""Named pipeline profiles — the reference's two PipeConfig presets.

The reference ships LoadDBs_conf.pm (Ensembl main) and
LoadDBs_EG_conf.pm (Ensembl Genomes) as subclassed eHive configs whose
deltas are a handful of defaults; here the same deltas are plain data
selected by ``--profile`` on the CLI.

Field provenance:
- ensembl: ftp.ensembl.org, rsync on, release = software version,
  priority species homo_sapiens/mus_musculus/danio_rerio + groups
  core/variation, download capacity 5 / tolerance 10%, load capacity 4
  / tolerance 50%, max_retry 1 (LoadDBs_conf.pm:34-92,130-190).
- eg: ftp.ensemblgenomes.org, rsync OFF, release 'current', division
  required in source paths, priority species EMPTY + groups
  core/variation, himem download rc-class, high-priority load capacity
  8 (LoadDBs_EG_conf.pm:36-56,88,118-161).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class Profile:
    name: str
    ftp_host: str
    ftp_port: int = 21
    rsync: bool = True
    release: str | int = "current"
    division: str = ""
    mode: str = "all"
    priority_species: tuple[str, ...] = ()
    priority_groups: tuple[str, ...] = ("core", "variation")
    download_capacity: int = 5  # -analysis_capacity on 'download'
    download_himem: bool = False  # -rc_name => 'himem'
    download_failed_tolerance: float = 0.10
    load_capacity: int = 4  # -hive_capacity on 'load_files'
    high_priority_load_capacity: int = 4
    load_failed_tolerance: float = 0.50
    max_retry: int = 1
    grant_users: tuple[str, ...] = field(default_factory=tuple)
    # Both reference configs default prerelease off (LoadDBs_conf.pm:66,
    # LoadDBs_EG_conf.pm:68). When on: source paths use the hidden
    # `.release-N` dot-dir (Base.pm:66) and grants are skipped entirely
    # (Grant.pm:77-78) so the databases stay private until release.
    # ``source_path``/``nfs_source_dir``/``grants`` below consume it —
    # flipping this one field flips both behaviors, like the reference's
    # single -prerelease pipeline-wide parameter.
    prerelease: bool = False

    def source_path(self, division: str | None = None) -> str:
        """S3 from the profile: `/pub/[.]release-N[/division]/mysql`
        with the hidden dot-dir when ``prerelease`` (Base.pm:62-74)."""
        from ensembl_database_loader_spark.sources.discovery import base_ftp_path

        div = division if division is not None else (self.division or None)
        return base_ftp_path(self.release, div, prerelease=self.prerelease)

    def nfs_source_dir(self, nfs_root: str, division: str | None = None) -> str:
        """The NFS-mirror twin of ``source_path`` (Base.pm:123-144)."""
        from ensembl_database_loader_spark.sources.discovery import nfs_ftp_site_dir

        div = division if division is not None else (self.division or None)
        return nfs_ftp_site_dir(
            nfs_root, self.release, div, prerelease=self.prerelease
        )

    def grants(self, database: str) -> list[str]:
        """G1 from the profile: the grant DDL + flush for ``database``,
        or NOTHING on a prerelease load (Grant.pm:77-78, 96-97)."""
        from ensembl_database_loader_spark.sinks.jdbc import (
            DEFAULT_GRANT_USERS,
            grant_statements,
        )

        users = self.grant_users or DEFAULT_GRANT_USERS
        return grant_statements(database, users, prerelease=self.prerelease)


PROFILES: dict[str, Profile] = {
    "ensembl": Profile(
        name="ensembl",
        ftp_host="ftp.ensembl.org",
        rsync=True,
        release="current",  # reference: software_version() of the API checkout
        priority_species=("homo_sapiens", "mus_musculus", "danio_rerio"),
    ),
    "eg": Profile(
        name="eg",
        ftp_host="ftp.ensemblgenomes.org",
        rsync=False,  # LoadDBs_EG_conf.pm:43
        release="current",  # LoadDBs_EG_conf.pm:57
        priority_species=(),  # LoadDBs_EG_conf.pm:88
        download_himem=True,  # LoadDBs_EG_conf.pm:120
        high_priority_load_capacity=8,  # LoadDBs_EG_conf.pm:160
    ),
}


def get_profile(name: str) -> Profile:
    try:
        return PROFILES[name]
    except KeyError:
        raise KeyError(
            f"unknown profile {name!r}; available: {sorted(PROFILES)}"
        ) from None
