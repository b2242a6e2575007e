"""Hadoop FileSystem helpers for artifact maintenance.

Index/codes artifacts live wherever the Spark job writes them — local
disk in tests, object storage (s3a://, abfs://, gs://) at 100 TB.  The
path-form maintenance operators (compact_ivf_codes,
rebuild_ivf_pq_index) previously walked `pathlib.Path` and swapped with
`os.rename`/`shutil.rmtree`, which only work on a POSIX mount.  This
module routes the same operations through Spark's own Hadoop
FileSystem API (`Path.getFileSystem(hadoopConf)`), which resolves the
scheme per path — file://, hdfs://, s3a://, abfs:// all behave — while
staying bit-identical on the local filesystem the tests run on.

Reference parity note: the reference engine delegates all storage to
the warehouse (crates/dbt-xdbc); this module is the Spark-native
analog for the engine's OWN artifacts.
"""

from __future__ import annotations


class HadoopFS:
    """Thin wrapper over org.apache.hadoop.fs.FileSystem for ONE
    scheme+authority (resolved from the root path it is built with).
    All paths passed in must share that scheme — the usual case, since
    an artifact and its siblings live next to each other.
    """

    def __init__(self, spark, root: str):
        jvm = spark._jvm
        self._Path = jvm.org.apache.hadoop.fs.Path
        self._conf = spark._jsc.hadoopConfiguration()
        self._fs = self._Path(root).getFileSystem(self._conf)

    def path(self, p: str):
        return self._Path(p)

    def exists(self, p: str) -> bool:
        return bool(self._fs.exists(self._Path(p)))

    def list_status(self, p: str) -> list:
        """FileStatus list for a directory ([] if it does not exist)."""
        jp = self._Path(p)
        if not self._fs.exists(jp):
            return []
        return list(self._fs.listStatus(jp))

    def subdirs(self, p: str) -> list[str]:
        """Names of immediate subdirectories, sorted."""
        return sorted(s.getPath().getName() for s in self.list_status(p)
                      if s.isDirectory())

    def files(self, p: str, suffix: str = "") -> list[tuple[str, int]]:
        """(name, bytes) of immediate regular files, sorted by name."""
        out = [(s.getPath().getName(), int(s.getLen()))
               for s in self.list_status(p)
               if s.isFile() and s.getPath().getName().endswith(suffix)]
        return sorted(out)

    def delete(self, p: str) -> None:
        """Recursive delete, ignore-missing (shutil.rmtree parity)."""
        jp = self._Path(p)
        if self._fs.exists(jp):
            self._fs.delete(jp, True)

    def rename(self, src: str, dst: str) -> None:
        """Directory rename with os.rename semantics: the destination
        must NOT exist (Hadoop rename onto an existing directory moves
        the source INSIDE it — posix mv — which would silently nest
        the artifact).  Raises on failure; on HDFS/local this is one
        atomic metadata op, on s3a it is a copy+delete (documented
        cost of object storage — the swap window is still
        whole-artifact: each version is only ever complete or absent).
        """
        jsrc, jdst = self._Path(src), self._Path(dst)
        if self._fs.exists(jdst):
            raise IOError(f"rename destination exists: {dst}")
        if not self._fs.rename(jsrc, jdst):
            raise IOError(f"rename failed: {src} -> {dst}")
