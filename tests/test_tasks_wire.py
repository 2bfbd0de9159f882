"""Wire-parity proof for the Tasks service: drive OUR server with
message classes compiled from the REFERENCE's own scheduling.proto
(same proof pattern as test_metadata_wire.py / test_wire_compat.py).

Reference service definition: scheduling/proto/scheduling.proto:18-31,
hosted by the metadata server (metadata/metadata.go:1940-2233).
"""

import os
import shutil
import subprocess
import sys
import threading
import time
from concurrent import futures

import grpc
import pytest

REF_SCHED = "/root/reference/scheduling/proto/scheduling.proto"
REF_META = "/root/reference/metadata/proto/metadata.proto"

pytestmark = pytest.mark.skipif(
    not (
        os.path.exists(REF_SCHED)
        and os.path.exists(REF_META)
        and shutil.which("protoc")
    ),
    reason="reference protos or protoc unavailable",
)


@pytest.fixture(scope="module")
def ref_pb(tmp_path_factory):
    d = tmp_path_factory.mktemp("refschedproto")
    # Rename packages for the in-process copies (our own compiled copies
    # of the same files are already registered in the descriptor pool);
    # package names do not affect message wire bytes.  Method paths are
    # built manually below with the reference's real service name.
    meta_dir = d / "metadata" / "proto"
    meta_dir.mkdir(parents=True)
    mtext = open(REF_META).read().replace(
        "package featureform.serving.metadata.proto;",
        "package refsched.metadata.proto;",
    )
    (meta_dir / "metadata.proto").write_text(mtext)
    stext = (
        open(REF_SCHED)
        .read()
        .replace(
            "package featureform.scheduling.proto;",
            "package refsched.scheduling.proto;",
        )
        .replace(
            "featureform.serving.metadata.proto.",
            "refsched.metadata.proto.",
        )
    )
    (d / "ref_scheduling.proto").write_text(stext)
    subprocess.run(
        [
            "protoc",
            f"--python_out={d}",
            "-I",
            str(d),
            "ref_scheduling.proto",
            "metadata/proto/metadata.proto",
        ],
        check=True,
        cwd=d,
    )
    sys.path.insert(0, str(d))
    try:
        import ref_scheduling_pb2 as pb

        yield pb
    finally:
        sys.path.remove(str(d))


@pytest.fixture(scope="module")
def our_server():
    from embeddinghub_tpu.featurestore.resources import ResourceID, ResourceType
    from embeddinghub_tpu.featurestore.scheduling import TaskManager
    from embeddinghub_tpu.featurestore.tasks_wire import (
        TasksWireService,
        register,
    )

    tasks = TaskManager()
    task = tasks.create_task(
        "materialize clicks",
        "materialize",
        ResourceID(ResourceType.FEATURE_VARIANT, "clicks", "v1"),
    )
    server = grpc.server(futures.ThreadPoolExecutor(max_workers=8))
    register(TasksWireService(tasks, watch_timeout_s=5.0), server)
    port = server.add_insecure_port("127.0.0.1:0")
    server.start()
    yield f"127.0.0.1:{port}", tasks, task
    server.stop(0)


_SVC = "/featureform.scheduling.proto.Tasks"


def _uu(channel, name, pb_req, pb_resp):
    return channel.unary_unary(
        f"{_SVC}/{name}",
        request_serializer=pb_req.SerializeToString,
        response_deserializer=pb_resp.FromString,
    )


def _us(channel, name, pb_req, pb_resp):
    return channel.unary_stream(
        f"{_SVC}/{name}",
        request_serializer=pb_req.SerializeToString,
        response_deserializer=pb_resp.FromString,
    )


def test_task_and_run_lifecycle_via_reference_stub(ref_pb, our_server):
    addr, tasks, task = our_server
    with grpc.insecure_channel(addr) as ch:
        # task lookup carries name/type/target through reference messages
        got = _uu(ch, "GetTaskByID", ref_pb.TaskID, ref_pb.TaskMetadata)(
            ref_pb.TaskID(id=str(task.id))
        )
        assert got.name == "materialize clicks"
        assert got.type == ref_pb.TaskType.RESOURCE_CREATION
        assert got.nameVariant.resourceID.resource.name == "clicks"
        assert got.nameVariant.resourceID.resource.variant == "v1"

        # create a run, drive PENDING -> RUNNING -> READY with logs
        rid = _uu(ch, "CreateTaskRun", ref_pb.CreateRunRequest, ref_pb.RunID)(
            ref_pb.CreateRunRequest(
                taskID=ref_pb.TaskID(id=str(task.id)), name="apply-1"
            )
        )
        upd = ref_pb.StatusUpdate(runID=rid, taskID=ref_pb.TaskID(id=str(task.id)))
        upd.status.status = 5  # RUNNING
        _uu(ch, "SetRunStatus", ref_pb.StatusUpdate, ref_pb.Empty)(upd)
        _uu(ch, "AddRunLog", ref_pb.Log, ref_pb.Empty)(
            ref_pb.Log(runID=rid, log="chunk 0/4 copied")
        )
        _uu(ch, "SetRunResumeID", ref_pb.ResumeIDUpdate, ref_pb.Empty)(
            ref_pb.ResumeIDUpdate(
                runID=rid, resumeID=ref_pb.ResumeID(id="resume-7")
            )
        )

        unfinished = list(
            _us(ch, "GetUnfinishedRuns", ref_pb.Empty, ref_pb.TaskRunMetadata)(
                ref_pb.Empty()
            )
        )
        assert any(r.runID.id == rid.id for r in unfinished)

        upd.status.status = 3  # READY
        _uu(ch, "SetRunStatus", ref_pb.StatusUpdate, ref_pb.Empty)(upd)

        run = _uu(ch, "GetRunMetadata", ref_pb.TaskRunID, ref_pb.TaskRunMetadata)(
            ref_pb.TaskRunID(runID=rid, taskID=ref_pb.TaskID(id=str(task.id)))
        )
        assert run.status.status == 3
        assert run.resumeID.id == "resume-7"
        assert any("chunk 0/4" in line for line in run.logs)
        assert run.startTime.seconds > 0 and run.endTime.seconds > 0

        latest = _uu(ch, "GetLatestRun", ref_pb.TaskID, ref_pb.TaskRunMetadata)(
            ref_pb.TaskID(id=str(task.id))
        )
        assert latest.runID.id == rid.id

        runs = list(
            _us(ch, "GetRuns", ref_pb.TaskID, ref_pb.TaskRunMetadata)(
                ref_pb.TaskID(id=str(task.id))
            )
        )
        assert {r.runID.id for r in runs} >= {rid.id}


def test_watch_for_cancel_unblocks_on_cancellation(ref_pb, our_server):
    addr, tasks, task = our_server
    from embeddinghub_tpu.featurestore.scheduling import RunStatus

    run = tasks.create_run(task.id, name="to-cancel")
    with grpc.insecure_channel(addr) as ch:
        # response type is metadata ResourceStatus; decode manually
        watch = ch.unary_unary(
            f"{_SVC}/WatchForCancel",
            request_serializer=ref_pb.TaskRunID.SerializeToString,
            response_deserializer=lambda b: b,
        )

        def cancel_soon():
            time.sleep(0.3)
            tasks.set_run_status(run.run_id, RunStatus.CANCELLED, "user abort")

        t = threading.Thread(target=cancel_soon)
        t.start()
        t0 = time.monotonic()
        raw = watch(
            ref_pb.TaskRunID(runID=ref_pb.RunID(id=str(run.run_id)))
        )
        elapsed = time.monotonic() - t0
        t.join()
        assert elapsed < 4.0  # unblocked by the cancel, not the timeout
        # decode with our own compiled ResourceStatus (wire-identical)
        from embeddinghub_tpu.featurestore.proto import ff_metadata_pb2 as mpb

        st = mpb.ResourceStatus.FromString(raw)
        assert st.status == mpb.ResourceStatus.CANCELLED
        assert st.error_message == "user abort"


def test_unknown_ids_return_not_found(ref_pb, our_server):
    addr, _, _ = our_server
    with grpc.insecure_channel(addr) as ch:
        with pytest.raises(grpc.RpcError) as ei:
            _uu(ch, "GetTaskByID", ref_pb.TaskID, ref_pb.TaskMetadata)(
                ref_pb.TaskID(id="9999")
            )
        assert ei.value.code() == grpc.StatusCode.NOT_FOUND
