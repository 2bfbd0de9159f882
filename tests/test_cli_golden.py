"""Golden-file snapshots of CLI / console output (VERDICT r4 weak #6).

The reference client's console output is a de-facto API — scripts parse
`featureform list/get` columns (reference ``client/src/featureform/
format.py:8-53``, ``get.py:40-58``, ``list.py``) — so the rebuild's
output is pinned byte-for-byte against golden files in
``tests/golden/``.  A deliberate format change must update the golden
file in the same commit, making output drift reviewable.

Regenerate after an intentional change with:
    python -m pytest tests/test_cli_golden.py --golden-update
"""

import io

import pytest

GOLDEN_DIR = "tests/golden"


def _check(name: str, got: str, update: bool) -> None:
    import pathlib

    p = pathlib.Path(GOLDEN_DIR) / name
    if update or not p.exists():
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_text(got)
        if not update:
            pytest.fail(
                f"golden file {p} was missing; wrote it — rerun to verify"
            )
        return
    want = p.read_text()
    assert got == want, (
        f"output drift vs {p}\n--- golden ---\n{want}\n--- got ---\n{got}"
    )


@pytest.fixture
def update(request):
    return bool(request.config.getoption("--golden-update", default=False))


@pytest.fixture
def applied_db(tmp_path):
    from embeddinghub_tpu.featurestore import cli
    from embeddinghub_tpu.featurestore.providers.base import (
        reset_provider_cache,
    )

    reset_provider_cache()
    defs = tmp_path / "defs.py"
    defs.write_text(
        """
import embeddinghub_tpu.featurestore as ff
reg = ff.global_registrar()
reg.register_user("alice")
reg.register_sqlite_offline("wh")
reg.register_memory_online("cache")
reg.register_entity("user")
reg.register_primary_data("events", provider="wh", location={"rows": [
    {"user_id": "u1", "clicks": 7}, {"user_id": "u2", "clicks": 3}]})
reg.register_feature("clicks", source=("events", "default"), entity="user",
                     entity_column="user_id", value_column="clicks",
                     provider="cache", owner="alice",
                     description="click count per user")
"""
    )
    db = str(tmp_path / "state.db")
    assert cli.main(["--db", db, "apply", str(defs)]) == 0
    return db


def _run_cli(capsys, argv):
    from embeddinghub_tpu.featurestore import cli

    capsys.readouterr()  # drain
    assert cli.main(argv) == 0
    return capsys.readouterr().out


def test_golden_list_feature(applied_db, capsys, update):
    _check(
        "list_feature.txt",
        _run_cli(capsys, ["--db", applied_db, "list", "feature"]),
        update,
    )


def test_golden_list_provider(applied_db, capsys, update):
    _check(
        "list_provider.txt",
        _run_cli(capsys, ["--db", applied_db, "list", "provider"]),
        update,
    )


def test_golden_get_feature(applied_db, capsys, update):
    _check(
        "get_feature.txt",
        _run_cli(
            capsys, ["--db", applied_db, "get", "feature", "clicks", "default"]
        ),
        update,
    )


def test_golden_get_source(applied_db, capsys, update):
    _check(
        "get_source.txt",
        _run_cli(
            capsys, ["--db", applied_db, "get", "source", "events", "default"]
        ),
        update,
    )


def test_golden_head(applied_db, capsys, update):
    _check(
        "head_events.txt",
        _run_cli(capsys, ["--db", applied_db, "head", "events"]),
        update,
    )


def test_golden_format_rows(update):
    """format.py primitives: the exact 30-char column grid the
    reference prints (format.py:8-12)."""
    from embeddinghub_tpu.featurestore.format import format_pg, format_rows

    buf = io.StringIO()
    format_rows("NAME", "STATUS", out=buf)
    format_rows("a", None, out=buf)
    format_rows("NAME", "VARIANT", "STATUS", out=buf)
    format_rows("f", "default", "READY", out=buf)
    format_rows("A", "B", "C", "D", out=buf)
    format_rows("A", "B", "C", "D", "E", out=buf)
    format_rows([("row1", "x"), ("row2", "y")], out=buf)
    format_rows("plain string", out=buf)
    format_pg("SOURCE: ", out=buf)
    format_pg(out=buf)  # empty title still prints its line (reference)
    _check("format_rows.txt", buf.getvalue(), update)


def test_golden_status_display_plain(update):
    """Plain (non-TTY) apply status transcript: one line per status
    change (reference status_display.py:47-252 analog's CI mode)."""
    from embeddinghub_tpu.featurestore.metadata import MetadataStore
    from embeddinghub_tpu.featurestore.resources import (
        FeatureVariant, Status,
    )
    from embeddinghub_tpu.featurestore.status_display import StatusDisplayer

    md = MetadataStore()
    fv = FeatureVariant(
        name="clicks", variant="default", entity="user", owner="alice",
        source=("events", "default"), value_type="int",
    )
    md.create(fv)
    buf = io.StringIO()
    disp = StatusDisplayer(md, [fv], plain=True, poll_s=0.0, out=buf)
    md.set_status(fv.rid(), Status.RUNNING)
    disp.refresh()
    disp._print_changes()
    md.set_status(fv.rid(), Status.READY)
    disp.refresh()
    disp._print_changes()
    _check("status_display_plain.txt", buf.getvalue(), update)
