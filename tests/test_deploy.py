"""Deployment-block parity tests (reference ``infra_block.py:5-13``):
named save/load with overwrite, registry prefixing, pull-policy
validation, and deterministic spark-submit rendering."""

from __future__ import annotations

import json
import subprocess
import sys

import pytest

from prefect_flow_arc_indexer_spark.pipeline.deploy import (
    ContainerImageBlock,
    list_blocks,
    load_block,
    save_block,
    spark_submit_command,
)


def test_save_load_roundtrip_and_overwrite(tmp_path):
    b1 = ContainerImageBlock(image="repo/arc:1.0", registry="reg.example.com")
    save_block(b1, "prod", tmp_path)
    assert load_block("prod", tmp_path) == b1
    # overwrite=True contract: re-saving the same name replaces silently
    b2 = ContainerImageBlock(image="repo/arc:2.0", registry="reg.example.com")
    save_block(b2, "prod", tmp_path)
    assert load_block("prod", tmp_path) == b2
    assert list_blocks(tmp_path) == ["prod"]


def test_missing_block_and_bad_names(tmp_path):
    with pytest.raises(KeyError):
        load_block("nope", tmp_path)
    with pytest.raises(ValueError):
        save_block(ContainerImageBlock(image="x"), "../evil", tmp_path)
    assert list_blocks(tmp_path / "absent") == []


def test_registry_prefixing():
    # DockerRegistry semantics: registry scopes the pull...
    b = ContainerImageBlock(image="repo/arc:1.0", registry="reg.example.com")
    assert b.full_image == "reg.example.com/repo/arc:1.0"
    # ...default docker.io = no prefix; already-prefixed not doubled
    assert ContainerImageBlock(image="repo/arc:1.0").full_image == "repo/arc:1.0"
    pre = ContainerImageBlock(
        image="reg.example.com/repo/arc:1.0", registry="reg.example.com"
    )
    assert pre.full_image == "reg.example.com/repo/arc:1.0"


def test_validation():
    with pytest.raises(ValueError):
        ContainerImageBlock(image="")
    with pytest.raises(ValueError):
        ContainerImageBlock(image="x", image_pull_policy="ALWAYS")  # K8s spelling


def test_spark_confs_map_reference_fields():
    b = ContainerImageBlock(image="repo/arc:1.0", registry="r.io")
    confs = b.spark_confs()
    assert confs["spark.kubernetes.container.image"] == "r.io/repo/arc:1.0"
    # reference hardcodes image_pull_policy="ALWAYS" (infra_block.py:11)
    assert confs["spark.kubernetes.container.image.pullPolicy"] == "Always"
    # reference auto_remove=True (infra_block.py:9)
    assert confs["spark.kubernetes.executor.deleteOnTermination"] == "true"
    no_rm = ContainerImageBlock(image="x", auto_remove=False).spark_confs()
    assert "spark.kubernetes.executor.deleteOnTermination" not in no_rm


def test_spark_submit_command_deterministic_and_overridable():
    b = ContainerImageBlock(image="repo/arc:1.0", registry="r.io")
    argv = spark_submit_command(
        b,
        master="k8s://https://api:6443",
        extra_confs={"spark.executor.instances": "50"},
        app_args=["--full-sync", "--es-nodes", "es:9200"],
    )
    assert argv[:5] == [
        "spark-submit", "--master", "k8s://https://api:6443",
        "--deploy-mode", "cluster",
    ]
    assert "--conf" in argv
    assert "spark.executor.instances=50" in argv
    assert argv[-3:] == ["--full-sync", "--es-nodes", "es:9200"]
    # job confs win on collision, and rendering is deterministic
    over = spark_submit_command(
        b,
        master="k8s://x",
        extra_confs={"spark.kubernetes.container.image": "r.io/hotfix:1"},
    )
    assert "spark.kubernetes.container.image=r.io/hotfix:1" in over
    assert over == spark_submit_command(
        b,
        master="k8s://x",
        extra_confs={"spark.kubernetes.container.image": "r.io/hotfix:1"},
    )


def test_cli_matches_reference_argparse_surface(tmp_path):
    # infra_block.py: --image required, --name required, --registry optional
    out = subprocess.run(
        [
            sys.executable, "-m",
            "prefect_flow_arc_indexer_spark.pipeline.deploy",
            "--image", "repo/arc:1.0", "--name", "prod",
            "--registry", "reg.example.com",
            "--block-dir", str(tmp_path),
        ],
        capture_output=True,
        text=True,
        check=True,
    )
    msg = json.loads(out.stdout)
    assert msg["image"] == "reg.example.com/repo/arc:1.0"
    assert load_block("prod", tmp_path).image == "repo/arc:1.0"
