"""Deployment-infrastructure blocks — the Spark analog of the reference's
Prefect Docker infra registration (``/root/reference/infra_block.py:5-13``).

The reference packages the flow as a Docker image and saves a named,
reusable ``DockerContainer`` block (image + registry + ``auto_remove=True``
+ ``image_pull_policy="ALWAYS"``) that Prefect deployments reference by
name. The Spark-first equivalent of that object is the set of
``spark-submit`` confs that pin the SAME operational choices for a
Spark-on-Kubernetes (or YARN) job:

- ``image`` / ``registry``        -> ``spark.kubernetes.container.image``
  (registry-prefixed, exactly like ``DockerRegistry`` prefixes the pull)
- ``image_pull_policy="ALWAYS"``  -> ``spark.kubernetes.container.image.pullPolicy=Always``
- ``auto_remove=True``            -> ``spark.kubernetes.executor.deleteOnTermination=true``
  + ``spark.kubernetes.driver.service.deleteOnTermination=true``

Blocks are saved/loaded by NAME from a JSON registry directory (the moral
equivalent of Prefect's block store): ``save()`` is atomic-overwrite, so
re-registering an updated image under the same name is safe mid-flight —
the same ``overwrite=True`` contract the reference uses.

``spark_submit_command()`` renders the block into a full, deterministic
``spark-submit`` argv — the piece a scheduler (cron, Airflow, Argo) stores
where the reference stores a Prefect deployment. Everything here is plain
stdlib + JSON: no cluster, no Docker daemon, no Prefect import — which is
what makes it unit-testable in this sandbox and portable to any launcher.

CLI (mirrors ``infra_block.py``'s argparse surface)::

    python -m prefect_flow_arc_indexer_spark.pipeline.deploy \
        --image repo/arc-indexer:1.2.3 --name arc-indexer-prod \
        [--registry registry.example.com] [--block-dir /etc/arc/blocks]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import tempfile
from pathlib import Path

__all__ = [
    "ContainerImageBlock",
    "save_block",
    "load_block",
    "list_blocks",
    "spark_submit_command",
]

# K8s imagePullPolicy enum — Spark passes the value through to the pod
# spec verbatim, so only the three K8s-legal spellings are accepted.
_PULL_POLICIES = ("Always", "IfNotPresent", "Never")


@dataclasses.dataclass(frozen=True)
class ContainerImageBlock:
    """A named, reusable container-image configuration for cluster runs.

    Field-for-field parity with the reference's block
    (``infra_block.py:7-13``): ``image``, ``registry`` (optional — default
    docker.io semantics, i.e. no prefix), ``image_pull_policy`` (reference
    hardcodes ALWAYS; we default the same but allow the other two K8s
    values), ``auto_remove`` (reference hardcodes True)."""

    image: str
    registry: str | None = None
    image_pull_policy: str = "Always"
    auto_remove: bool = True

    def __post_init__(self) -> None:
        if not self.image:
            raise ValueError("image is required")
        if self.image_pull_policy not in _PULL_POLICIES:
            raise ValueError(
                f"image_pull_policy must be one of {_PULL_POLICIES}, "
                f"got {self.image_pull_policy!r}"
            )

    @property
    def full_image(self) -> str:
        """Registry-prefixed image ref, the way ``DockerRegistry`` scopes
        the pull in the reference. A registry that is already part of the
        image ref is not double-prefixed — detected with Docker's own
        reference-parsing rule: the first path component is a registry
        host only if it contains '.' or ':' or is 'localhost', so
        registry='repo' + image='repo/arc:1.0' still gets prefixed
        ('repo' there is a namespace, not a host — ADVICE r9)."""
        if not self.registry:
            return self.image
        first = self.image.split("/", 1)[0]
        looks_like_host = "." in first or ":" in first or first == "localhost"
        if (
            looks_like_host
            and self.image.startswith(self.registry + "/")
        ):
            return self.image
        return f"{self.registry}/{self.image}"

    def spark_confs(self) -> dict[str, str]:
        """The block rendered as Spark-on-K8s confs (sorted for
        deterministic argv assembly)."""
        confs = {
            "spark.kubernetes.container.image": self.full_image,
            "spark.kubernetes.container.image.pullPolicy": self.image_pull_policy,
        }
        if self.auto_remove:
            confs["spark.kubernetes.executor.deleteOnTermination"] = "true"
            confs["spark.kubernetes.driver.service.deleteOnTermination"] = "true"
        return dict(sorted(confs.items()))


def _block_path(name: str, block_dir: str | Path) -> Path:
    if not name or "/" in name or name.startswith("."):
        raise ValueError(f"invalid block name {name!r}")
    return Path(block_dir) / f"{name}.json"


def save_block(
    block: ContainerImageBlock, name: str, block_dir: str | Path
) -> Path:
    """Persist ``block`` under ``name`` (atomic overwrite, the reference's
    ``save(name=..., overwrite=True)`` contract — ``infra_block.py:13``)."""
    path = _block_path(name, block_dir)
    path.parent.mkdir(parents=True, exist_ok=True)
    payload = json.dumps(
        dataclasses.asdict(block), indent=1, sort_keys=True
    )
    # write-temp-then-rename so a concurrent load never reads a torn file
    fd, tmp = tempfile.mkstemp(dir=path.parent, suffix=".tmp")
    try:
        with os.fdopen(fd, "w") as f:
            f.write(payload)
        os.replace(tmp, path)
    except BaseException:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        raise
    return path


def load_block(name: str, block_dir: str | Path) -> ContainerImageBlock:
    path = _block_path(name, block_dir)
    try:
        raw = json.loads(path.read_text())
    except FileNotFoundError:
        raise KeyError(f"no block named {name!r} in {block_dir}") from None
    return ContainerImageBlock(**raw)


def list_blocks(block_dir: str | Path) -> list[str]:
    d = Path(block_dir)
    if not d.is_dir():
        return []
    return sorted(p.stem for p in d.glob("*.json"))


def spark_submit_command(
    block: ContainerImageBlock,
    *,
    master: str,
    primary_resource: str = "local:///opt/app/run_indexer.py",
    deploy_mode: str = "cluster",
    app_name: str = "prefect-flow-arc-indexer",
    extra_confs: dict[str, str] | None = None,
    app_args: list[str] | None = None,
) -> list[str]:
    """Render the block into a deterministic ``spark-submit`` argv.

    ``extra_confs`` layers the job-specific tuning (executor sizing,
    shuffle partitions, the connector ``--packages`` live in MIGRATION.md
    §6) over the block's image confs; job confs win on key collision so a
    deployment can override the block's defaults without editing it."""
    confs = {**block.spark_confs(), **(extra_confs or {})}
    argv = [
        "spark-submit",
        "--master",
        master,
        "--deploy-mode",
        deploy_mode,
        "--name",
        app_name,
    ]
    for k, v in sorted(confs.items()):
        argv += ["--conf", f"{k}={v}"]
    argv.append(primary_resource)
    argv += list(app_args or [])
    return argv


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(
        description="Save a container-image deployment block "
        "(reference infra_block.py CLI parity)"
    )
    p.add_argument("--image", required=True, help="container image to run")
    p.add_argument("--name", required=True, help="name of the block")
    p.add_argument(
        "--registry",
        required=False,
        help="image registry prefix, default docker.io (no prefix)",
    )
    p.add_argument(
        "--block-dir",
        default=os.environ.get("ARC_INDEXER_BLOCK_DIR", "./blocks"),
        help="directory holding the named-block JSON registry",
    )
    p.add_argument(
        "--pull-policy",
        default="Always",
        choices=_PULL_POLICIES,
        help="image pull policy (reference hardcodes ALWAYS)",
    )
    args = p.parse_args(argv)
    block = ContainerImageBlock(
        image=args.image,
        registry=args.registry,
        image_pull_policy=args.pull_policy,
    )
    path = save_block(block, args.name, args.block_dir)
    print(json.dumps({"saved": str(path), "image": block.full_image}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
