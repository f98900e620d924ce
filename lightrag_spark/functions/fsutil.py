"""Filesystem probes that work on whatever scheme a path lives on.

Driver-local ``os.path.exists`` is always False for hdfs:// or s3a://
URIs, which silently flips "have prior state" checks to the bootstrap
branch on a cluster.  These helpers go through the JVM Hadoop
FileSystem API so the answer matches what ``spark.read`` will see.
"""

from __future__ import annotations


def hadoop_path_exists(spark, path: str) -> bool:
    """True iff ``path`` exists on its own filesystem (local/HDFS/S3)."""
    try:
        jvm = spark._jvm
        jsc = spark._jsc
        hpath = jvm.org.apache.hadoop.fs.Path(path)
        fs = hpath.getFileSystem(jsc.hadoopConfiguration())
        return bool(fs.exists(hpath))
    except Exception:
        # e.g. spark-connect session without _jvm: fall back to probing
        # with a read and classifying the missing-path error.
        try:
            spark.read.parquet(path).schema
            return True
        except Exception:
            return False


def hadoop_dir_nonempty(spark, path: str) -> bool:
    """True iff ``path`` exists and contains at least one entry."""
    try:
        jvm = spark._jvm
        jsc = spark._jsc
        hpath = jvm.org.apache.hadoop.fs.Path(path)
        fs = hpath.getFileSystem(jsc.hadoopConfiguration())
        if not fs.exists(hpath):
            return False
        it = fs.listStatus(hpath)
        return len(it) > 0
    except Exception:
        return hadoop_path_exists(spark, path)
