"""``import_hub_model`` CLI — reference eland/cli/eland_import_hub_model.py:41-357.

The reference CLI traces a Hugging Face model and uploads TorchScript
chunks to an Elasticsearch deployment. On Spark there is no upload
protocol: "deploying" a model means registering a loader that
executors resolve at run time (model-per-partition mapInPandas, see
ml/pytorch.py). The CLI therefore writes a model-registry entry — a
JSON document with the hub id, task type and encoder config — that
``TransformerModel.from_registry`` resolves later. Every task type
applies on the deterministic no-torch stand-ins (ml/pytorch.py); a
real model swaps in at the per-batch scorer.

Usage:
    python -m eland_spark.cli --hub-model-id sentence-transformers/all-MiniLM-L6-v2 \
        --task-type text_embedding [--registry DIR] [--model-id NAME] [--start]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

from .ml.pytorch import SUPPORTED_TASK_TYPES, TransformerModel

__all__ = ["main", "register_model", "list_models", "default_registry"]

_TASK_HINTS = [
    # auto-detection from hub-id naming conventions (the reference
    # auto-detects from model config; name heuristics are the offline
    # equivalent)
    ("fill-mask", "fill_mask"),
    ("fill_mask", "fill_mask"),
    ("sentence-transformers/", "text_embedding"),
    ("embedding", "text_embedding"),
    ("-ner", "ner"),
    ("_ner", "ner"),
    ("ner-", "ner"),
    ("qa", "question_answering"),
    ("squad", "question_answering"),
    ("zero-shot", "zero_shot_classification"),
    ("sentiment", "text_classification"),
    ("classification", "text_classification"),
]


def default_registry() -> str:
    return os.environ.get(
        "ELAND_SPARK_MODEL_REGISTRY",
        os.path.join(os.path.expanduser("~"), ".eland_spark", "models"),
    )


def _derive_model_id(hub_model_id: str) -> str:
    # the reference's exact normalization (transformers.py:813-827):
    # whitespace/path separators -> __, lowercase, LAST 64 chars (keeps
    # the model name when the id is a long path), leading __ stripped
    from .ml.nlp_config import elasticsearch_model_id

    return elasticsearch_model_id(hub_model_id)


def _detect_task(hub_model_id: str) -> str | None:
    hid = hub_model_id.lower()
    for hint, task in _TASK_HINTS:
        if hint in hid:
            return task
    return None


def register_model(
    hub_model_id: str,
    task_type: str = "auto",
    model_id: str | None = None,
    registry: str | None = None,
    dim: int = 64,
    clear_previous: bool = False,
) -> dict:
    """Validate + write a registry entry; returns the entry dict."""
    if task_type == "auto":
        detected = _detect_task(hub_model_id)
        if detected is None:
            raise ValueError(
                f"could not auto-detect task type from {hub_model_id!r}; "
                f"pass --task-type (one of {SUPPORTED_TASK_TYPES})"
            )
        task_type = detected
    if task_type not in SUPPORTED_TASK_TYPES:
        raise ValueError(
            f"unknown task {task_type!r}; supported: {SUPPORTED_TASK_TYPES}"
        )
    model_id = model_id or _derive_model_id(hub_model_id)
    reg = registry or default_registry()
    os.makedirs(reg, exist_ok=True)
    path = os.path.join(reg, f"{model_id}.json")
    if os.path.exists(path) and not clear_previous:
        raise ValueError(
            f"model {model_id!r} already registered at {path}; "
            "pass --clear-previous to replace it"
        )
    entry = {
        "model_id": model_id,
        "hub_model_id": hub_model_id,
        "task_type": task_type,
        "dim": dim,
        "registered_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        # the trained-model config document the reference PUTs to the
        # trained-models API — persisted so a deployment is auditable
        "config": TransformerModel(
            hub_model_id, task_type, dim=dim
        ).model_config().to_dict(),
    }
    with open(path, "w") as f:
        json.dump(entry, f, indent=2)
    return entry


def load_model(model_id: str, registry: str | None = None) -> TransformerModel:
    """Resolve a registry entry back into a runnable TransformerModel."""
    path = os.path.join(registry or default_registry(), f"{model_id}.json")
    if not os.path.exists(path):
        raise KeyError(f"model {model_id!r} not found in registry")
    with open(path) as f:
        entry = json.load(f)
    return TransformerModel(
        entry["hub_model_id"], entry["task_type"], dim=entry.get("dim", 64)
    )


def list_models(registry: str | None = None) -> list[dict]:
    reg = registry or default_registry()
    if not os.path.isdir(reg):
        return []
    out = []
    for name in sorted(os.listdir(reg)):
        if name.endswith(".json"):
            with open(os.path.join(reg, name)) as f:
                out.append(json.load(f))
    return out


def get_arg_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        prog="eland_spark.cli", description=__doc__, exit_on_error=False
    )
    parser.add_argument("--hub-model-id", required=True)
    parser.add_argument("--model-id", default=None)
    parser.add_argument(
        "--task-type", default="auto", choices=["auto", *SUPPORTED_TASK_TYPES]
    )
    parser.add_argument("--registry", default=None)
    parser.add_argument("--dim", type=int, default=64)
    parser.add_argument("--clear-previous", action="store_true", default=False)
    parser.add_argument(
        "--start",
        action="store_true",
        default=False,
        help="smoke-run the registered model on a 2-row frame (needs a "
        "local Spark JVM; text_embedding only in this environment)",
    )
    return parser


def main(argv: list[str] | None = None) -> int:
    try:
        args = get_arg_parser().parse_args(argv)
        entry = register_model(
            args.hub_model_id,
            task_type=args.task_type,
            model_id=args.model_id,
            registry=args.registry,
            dim=args.dim,
            clear_previous=args.clear_previous,
        )
    except (ValueError, argparse.ArgumentError) as e:
        print(f"error: {e}", file=sys.stderr)
        return 2
    print(json.dumps(entry))
    if args.start:
        from .session import get_session

        model = load_model(entry["model_id"], args.registry)
        spark = get_session("eland_spark_cli")
        df = spark.createDataFrame([("hello world",), ("spark graft",)], ["text"])
        out = model.apply(df, "text")
        n = out.count()
        print(f"started: scored {n} rows, columns {out.columns}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
