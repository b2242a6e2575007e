"""Package dependency resolution — `dbt deps`.

Re-expresses the reference's dbt-deps crate semantics:
- package kinds (crates/dbt-schemas/src/schemas/packages.rs:27-32):
  hub {package, version}, git {git, revision, subdirectory},
  local {local}, tarball {tarball, name}
- hub resolution (crates/dbt-deps/src/hub_client.rs:103,
  package_listing.rs): pick the newest registry version satisfying
  every requested range
- tarball handling (crates/dbt-deps/src/tarball.rs): unpack, find the
  directory containing dbt_project.yml
- transitive resolution: installed packages' own packages.yml are
  resolved too, first-spec-wins per package name

Installation target is `<project>/dbt_packages/<pkg_name>/`, the layout
the project loader already consumes for macros/models.

The hub index is pluggable for offline use: DBT_HUB_INDEX (or the
`hub_index` argument) points at a JSON file
{"<package>": {"<version>": "<tarball path-or-url>", ...}, ...};
without it, hub packages resolve against hub.getdbt.com (network).
"""

from __future__ import annotations

import json
import os
import re
import shutil
import subprocess
import tarfile
import tempfile
import urllib.request
from dataclasses import dataclass, field
from pathlib import Path

import yaml

HUB_API = "https://hub.getdbt.com/api/v1/{package}.json"


@dataclass
class PackageSpec:
    kind: str  # hub | git | local | tarball
    name: str | None = None
    version: list[str] = field(default_factory=list)  # hub ranges
    git: str | None = None
    revision: str | None = None
    subdirectory: str | None = None
    local: str | None = None
    tarball: str | None = None


def load_package_specs(project_dir: str | Path) -> list[PackageSpec]:
    """Parse packages.yml / dependencies.yml (either is accepted, same
    as the reference loader)."""
    root = Path(project_dir)
    for fname in ("packages.yml", "dependencies.yml"):
        path = root / fname
        if path.exists():
            raw = yaml.safe_load(path.read_text()) or {}
            return [_parse_spec(e) for e in raw.get("packages", [])]
    return []


def _parse_spec(entry: dict) -> PackageSpec:
    if "local" in entry:
        return PackageSpec(kind="local", local=entry["local"])
    if "git" in entry:
        return PackageSpec(kind="git", git=entry["git"],
                           revision=entry.get("revision"),
                           subdirectory=entry.get("subdirectory"))
    if "tarball" in entry:
        return PackageSpec(kind="tarball", tarball=entry["tarball"],
                           name=entry.get("name"))
    if "package" in entry:
        v = entry.get("version", [])
        return PackageSpec(kind="hub", name=entry["package"],
                           version=[v] if isinstance(v, str) else list(v))
    raise ValueError(f"unrecognized package spec: {entry!r}")


# --- semver ranges (package_listing.rs version matching) ---------------

_VER_RE = re.compile(r"^\s*(>=|<=|>|<|=|~>)?\s*v?(\d+(?:\.\d+)*)")


def _ver_tuple(s: str) -> tuple[int, ...]:
    return tuple(int(p) for p in s.split("."))


def _satisfies(version: str, ranges: list[str]) -> bool:
    v = _ver_tuple(version)
    for rng in ranges:
        m = _VER_RE.match(rng)
        if not m:
            return False
        op, bound = m.group(1) or "=", _ver_tuple(m.group(2))
        # pad to common length so 1.1 == 1.1.0
        n = max(len(v), len(bound))
        a, b = v + (0,) * (n - len(v)), bound + (0,) * (n - len(bound))
        ok = {"=": a == b, ">=": a >= b, "<=": a <= b,
              ">": a > b, "<": a < b,
              "~>": a >= b and a[:len(bound) - 1] == bound[:-1]}[op]
        if not ok:
            return False
    return True


def resolve_hub_version(package: str, ranges: list[str],
                        hub_index: dict | None = None) -> tuple[str, str]:
    """Newest version satisfying all ranges -> (version, tarball_url).

    hub_index: {package: {version: tarball}} for offline resolution;
    falls back to the live hub API.
    """
    if hub_index is not None and package in hub_index:
        versions = hub_index[package]
        candidates = [ver for ver in versions if _satisfies(ver, ranges)]
        if not candidates:
            raise ValueError(
                f"no version of {package} satisfies {ranges} "
                f"(available: {sorted(versions)})")
        best = max(candidates, key=_ver_tuple)
        return best, versions[best]
    with urllib.request.urlopen(HUB_API.format(package=package)) as r:
        meta = json.load(r)
    versions = meta.get("versions", {})
    candidates = [ver for ver in versions if _satisfies(ver, ranges)]
    if not candidates:
        raise ValueError(f"no version of {package} satisfies {ranges}")
    best = max(candidates, key=_ver_tuple)
    return best, versions[best]["downloads"]["tarball"]


# --- installers --------------------------------------------------------


def _project_name(pkg_dir: Path) -> str | None:
    f = pkg_dir / "dbt_project.yml"
    if not f.exists():
        return None
    return (yaml.safe_load(f.read_text()) or {}).get("name")


def _find_project_root(unpacked: Path) -> Path:
    """tarball.rs behavior: the project may be nested one level down
    (github tarballs wrap in <repo>-<ref>/)."""
    if (unpacked / "dbt_project.yml").exists():
        return unpacked
    for child in sorted(unpacked.iterdir()):
        if child.is_dir() and (child / "dbt_project.yml").exists():
            return child
    raise ValueError(f"no dbt_project.yml under {unpacked}")


def _install_tree(src: Path, packages_dir: Path, fallback_name: str) -> str:
    name = _project_name(src) or fallback_name
    dest = packages_dir / name
    if dest.exists():
        shutil.rmtree(dest)
    shutil.copytree(src, dest,
                    ignore=shutil.ignore_patterns(
                        "dbt_packages", "target", ".git"))
    return name


def _fetch_tarball(url_or_path: str, tmp: Path) -> Path:
    if re.match(r"^https?://", url_or_path):
        dest = tmp / "pkg.tar.gz"
        with urllib.request.urlopen(url_or_path) as r, open(dest, "wb") as f:
            shutil.copyfileobj(r, f)
        return dest
    return Path(url_or_path.removeprefix("file://"))


def _install_one(spec: PackageSpec, base_dir: Path, packages_dir: Path,
                 hub_index: dict | None) -> str:
    """base_dir: the directory whose packages.yml declared this spec —
    relative `local:` paths resolve against it (dbt semantics)."""
    if spec.kind == "local":
        src = (base_dir / spec.local).resolve()
        return _install_tree(src, packages_dir, src.name)

    if spec.kind == "tarball":
        with tempfile.TemporaryDirectory() as tmp:
            tar_path = _fetch_tarball(spec.tarball, Path(tmp))
            with tarfile.open(tar_path) as tf:
                tf.extractall(tmp, filter="data")
            root = _find_project_root(Path(tmp))
            # the tarball itself may BE the project dir listing
            return _install_tree(root, packages_dir,
                                 spec.name or root.name)

    if spec.kind == "git":
        with tempfile.TemporaryDirectory() as tmp:
            cmd = ["git", "clone", "--depth", "1"]
            if spec.revision:
                cmd += ["--branch", spec.revision]
            cmd += [spec.git, tmp + "/repo"]
            subprocess.run(cmd, check=True, capture_output=True)
            src = Path(tmp) / "repo"
            if spec.subdirectory:
                src = src / spec.subdirectory
            return _install_tree(
                src, packages_dir,
                Path(spec.git).stem.removesuffix(".git"))

    if spec.kind == "hub":
        _, tarball = resolve_hub_version(spec.name, spec.version, hub_index)
        return _install_one(
            PackageSpec(kind="tarball", tarball=tarball,
                        name=spec.name.split("/")[-1]),
            base_dir, packages_dir, hub_index)

    raise ValueError(f"unknown package kind {spec.kind!r}")


def install_deps(project_dir: str | Path,
                 hub_index: dict | str | None = None) -> list[str]:
    """Resolve and install every package (transitively) into
    dbt_packages/. Returns installed package names. First spec wins per
    package name (the reference errors on true version conflicts; for
    duplicate names we keep the first resolution — deterministic and
    idempotent)."""
    project_dir = Path(project_dir)
    packages_dir = project_dir / "dbt_packages"
    packages_dir.mkdir(exist_ok=True)

    if hub_index is None and os.environ.get("DBT_HUB_INDEX"):
        hub_index = os.environ["DBT_HUB_INDEX"]
    if isinstance(hub_index, str):
        hub_index = json.loads(Path(hub_index).read_text())

    installed: list[str] = []
    queue: list[tuple[PackageSpec, Path]] = [
        (s, project_dir) for s in load_package_specs(project_dir)]
    seen: set[str] = set()
    while queue:
        spec, base_dir = queue.pop(0)
        key = spec.name or spec.local or spec.git or spec.tarball
        if key in seen:
            continue
        seen.add(key)
        name = _install_one(spec, base_dir, packages_dir, hub_index)
        installed.append(name)
        # transitive deps of the installed package (relative local paths
        # resolve against the installed copy's location)
        queue.extend((s, packages_dir / name)
                     for s in load_package_specs(packages_dir / name))
    return installed
