"""Typed executor/credential/catalog configs (executor_credentials.py).

Mirrors the reference SDK's client-side validation semantics
(reference client/src/featureform/resources.py:199-346, 1007-1045,
3329-3594) — construction fails fast, serialization carries the exact
keys the providers unpack.
"""

import json

import pytest

from embeddinghub_tpu.featurestore import (
    AWSAssumeRoleCredentials,
    AWSStaticCredentials,
    BasicCredentials,
    DatabricksCredentials,
    EMRCredentials,
    GCPCredentials,
    GlueCatalog,
    KerberosCredentials,
    Registrar,
    SparkCredentials,
    SparkFlags,
)
from embeddinghub_tpu.featurestore.fferr import InvalidResourceError

DAPI = "dapi" + "a" * 32


def test_aws_static_requires_both_keys():
    c = AWSStaticCredentials(access_key="AK", secret_key="SK")
    assert c.config() == {
        "AccessKeyId": "AK", "SecretKey": "SK",
        "Type": "AWS_STATIC_CREDENTIALS",
    }
    with pytest.raises(InvalidResourceError):
        AWSStaticCredentials(access_key="AK")


def test_aws_assume_role_carries_no_secrets():
    assert AWSAssumeRoleCredentials().config() == {
        "Type": "AWS_ASSUME_ROLE_CREDENTIALS"
    }


def test_gcp_credentials_from_file(tmp_path):
    p = tmp_path / "sa.json"
    p.write_text(json.dumps({"client_email": "x@y"}))
    c = GCPCredentials(project_id="proj", credentials_path=str(p))
    assert c.config()["JSON"] == {"client_email": "x@y"}
    with pytest.raises(InvalidResourceError):
        GCPCredentials(project_id="proj", credentials_path=str(tmp_path / "no.json"))
    with pytest.raises(InvalidResourceError):
        GCPCredentials(project_id="", credentials_json={})


def test_basic_and_kerberos():
    assert BasicCredentials(username="u", password="p").config()["Username"] == "u"
    with pytest.raises(InvalidResourceError):
        BasicCredentials(username="")
    k = KerberosCredentials(username="u", password="p", krb5_conf="/etc/krb5.conf")
    assert k.config()["Krb5Conf"] == "/etc/krb5.conf"
    with pytest.raises(InvalidResourceError):
        KerberosCredentials(username="u", krb5_conf="")


def test_databricks_exactly_one_auth_mode():
    ok = DatabricksCredentials(host="h", token=DAPI,
                               cluster_id="abcd-efghij-klmnopqr")
    assert ok.config()["Cluster"] == "abcd-efghij-klmnopqr"
    # both modes at once
    with pytest.raises(InvalidResourceError):
        DatabricksCredentials(username="u", password="p", host="h",
                              token=DAPI, cluster_id="abcd-efghij-klmnopqr")
    # neither
    with pytest.raises(InvalidResourceError):
        DatabricksCredentials(cluster_id="abcd-efghij-klmnopqr")
    # malformed cluster id
    with pytest.raises(InvalidResourceError):
        DatabricksCredentials(host="h", token=DAPI, cluster_id="nope")
    # malformed token
    with pytest.raises(InvalidResourceError):
        DatabricksCredentials(host="h", token="dapi-short",
                              cluster_id="abcd-efghij-klmnopqr")


def test_emr_requires_cluster_region_credentials():
    aws = AWSStaticCredentials(access_key="AK", secret_key="SK")
    e = EMRCredentials(emr_cluster_id="j-123", emr_cluster_region="us-east-1",
                       credentials=aws)
    cfg = e.config()
    assert cfg["ClusterName"] == "j-123"
    assert cfg["Credentials"]["Type"] == "AWS_STATIC_CREDENTIALS"
    with pytest.raises(InvalidResourceError):
        EMRCredentials(emr_cluster_id="j-123", emr_cluster_region="us-east-1")


def test_spark_generic_validation(tmp_path):
    with pytest.raises(InvalidResourceError):
        SparkCredentials(master="local", deploy_mode="edge", python_version="3.9")
    with pytest.raises(InvalidResourceError):  # yarn needs site files
        SparkCredentials(master="yarn", deploy_mode="cluster", python_version="3.9")
    with pytest.raises(InvalidResourceError):  # unsupported python
        SparkCredentials(master="local", deploy_mode="client", python_version="2.7")
    core = tmp_path / "core-site.xml"
    yarn = tmp_path / "yarn-site.xml"
    core.write_text("<core/>")
    yarn.write_text("<yarn/>")
    c = SparkCredentials(master="YARN", deploy_mode="Cluster",
                         python_version="3.10",
                         core_site_path=str(core), yarn_site_path=str(yarn))
    cfg = c.config()
    assert cfg["Master"] == "yarn" and cfg["DeployMode"] == "cluster"
    assert cfg["PythonVersion"] == "3.10.10"  # pinned to the image patch
    assert cfg["CoreSite"] == "<core/>" and cfg["YarnSite"] == "<yarn/>"
    # empty version in cluster mode resolves to the client interpreter
    d = SparkCredentials(master="local", deploy_mode="cluster")
    assert d.python_version.startswith("3.")


def test_glue_catalog_iceberg_rules():
    g = GlueCatalog(region="us-east-1", database="db_1", warehouse="s3://wh")
    assert g.config()["TableFormat"] == "ICEBERG"
    with pytest.raises(InvalidResourceError):  # iceberg needs warehouse
        GlueCatalog(region="us-east-1", database="db")
    with pytest.raises(InvalidResourceError):  # bad db name
        GlueCatalog(region="r", database="bad-name", warehouse="w")
    delta = GlueCatalog(database="db", table_format="delta")
    assert delta.config()["TableFormat"] == "DELTA"


def test_spark_flags_round_trip():
    f = SparkFlags(spark_params={"spark.executor.memory": "4g"},
                   write_options={"mode": "overwrite"},
                   table_properties={"k": "v"})
    s = f.serialize()
    back = SparkFlags.deserialize(s)
    assert back == f
    assert SparkFlags.deserialize({}) is None


def test_register_spark_with_typed_executor():
    reg = Registrar()
    aws = AWSStaticCredentials(access_key="AK", secret_key="SK")
    emr = EMRCredentials(emr_cluster_id="j-9", emr_cluster_region="us-west-2",
                         credentials=aws)
    glue = GlueCatalog(region="us-west-2", database="db", warehouse="s3://wh")
    flags = SparkFlags(spark_params={"spark.driver.memory": "2g"})
    p = reg.register_spark(name="spark-emr", executor=emr, catalog=glue,
                           spark_flags=flags, filestore="s3://bucket")
    cfg = p.config
    assert cfg["executor_type"] == "EMR"
    assert cfg["executor_config"]["ClusterName"] == "j-9"
    assert cfg["catalog"]["Database"] == "db"
    assert cfg["spark_flags"]["SparkParams"] == {"spark.driver.memory": "2g"}
    # dict form still accepted
    p2 = reg.register_spark(name="spark-raw", executor_type="DATABRICKS",
                            executor_config={"Cluster": "c"})
    assert p2.config["executor_config"] == {"Cluster": "c"}
