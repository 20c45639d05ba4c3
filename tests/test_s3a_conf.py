"""The reference's only connector is S3 (whole-object reads,
6.5840/src/mr/worker.go:326-359). No object store exists in this sandbox,
so pin the config surface: s3a_conf() must assemble a cloud-safe session
config (magic committer — no directory renames — bounded pools, optional
MinIO-style endpoint + static keys), and it must be settable as Spark
conf without error."""

from __future__ import annotations

from golang_mapreduce_spark.session import s3a_conf


def test_s3a_conf_defaults_use_committer_and_provider_chain():
    conf = s3a_conf()
    assert conf["spark.hadoop.fs.s3a.impl"] == "org.apache.hadoop.fs.s3a.S3AFileSystem"
    # object-store-safe commit: no directory-rename protocol
    assert conf["spark.hadoop.fs.s3a.committer.name"] == "magic"
    assert conf["spark.sql.sources.commitProtocolClass"].endswith(
        "PathOutputCommitProtocol"
    )
    # no static keys by default -> standard credential provider chain
    assert "spark.hadoop.fs.s3a.access.key" not in conf
    assert "spark.hadoop.fs.s3a.aws.credentials.provider" not in conf


def test_s3a_conf_endpoint_style():
    conf = s3a_conf(
        endpoint="http://localhost:9000",
        access_key="minio",
        secret_key="minio123",
        path_style_access=True,
    )
    assert conf["spark.hadoop.fs.s3a.endpoint"] == "http://localhost:9000"
    assert conf["spark.hadoop.fs.s3a.path.style.access"] == "true"
    assert conf["spark.hadoop.fs.s3a.aws.credentials.provider"].endswith(
        "SimpleAWSCredentialsProvider"
    )


def test_s3a_conf_settable_on_live_session(spark):
    # spark.hadoop.* are pass-through Hadoop conf: setting them requires
    # no hadoop-aws jar until an s3a:// path is actually accessed
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    for k, v in s3a_conf(endpoint="http://localhost:9000").items():
        if k.startswith("spark.hadoop."):
            hconf.set(k.removeprefix("spark.hadoop."), v)
    assert hconf.get("fs.s3a.committer.name") == "magic"
