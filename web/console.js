const $ = (id) => document.getElementById(id);
const log = (m) => { $("log").textContent = `${new Date().toISOString().slice(11,19)} ${m}\n` + $("log").textContent; };
const headers = () => ({ "Authorization": `Bearer ${$("token").value}` });

async function refreshCredits() {
  const r = await fetch(`${$("base").value}/v1/credits/balance`, { headers: headers() });
  const b = await r.json();
  $("credits").textContent = r.ok
    ? `free ${b.freeCredits}/${b.dailyFreeLimit} today · paid ${b.paidCredits}`
    : `error: ${b.detail || r.status}`;
}

function showResult(result) {
  if (result?.restoredImage) $("after").src = `data:image/jpeg;base64,${result.restoredImage}`;
  const scores = result?.degradationAnalysis || {};
  $("scores").innerHTML = Object.entries(scores)
    .map(([k, v]) => `<span>${k}: <b>${Number(v).toFixed(2)}</b></span>`).join("");
  if (result?.timings) log(`timings: ${JSON.stringify(result.timings)}`);
}

async function uploadViaSlot(file) {
  // direct-upload flow (signed-URL analog): GET a 15-min slot, PUT the bytes,
  // submit by token — the large-file path that keeps multipart bodies small
  const r = await fetch(`${$("base").value}/v1/uploads/signed-url`, { headers: headers() });
  const slot = await r.json();
  if (!r.ok) throw new Error(slot.detail || slot.title || r.status);
  const put = await fetch(`${$("base").value}${slot.uploadUrl}`, {
    method: "PUT", headers: headers(), body: file,
  });
  if (!put.ok) {
    const e = await put.json().catch(() => ({}));
    throw new Error(`upload ${put.status}: ${e.detail || e.title || ""}`);
  }
  log(`uploaded ${file.name} (${file.size} B) → slot ${slot.token.slice(0, 8)}…`);
  return slot.token;
}

const SLOT_THRESHOLD_BYTES = 2 * 1024 * 1024;

async function submitJob(sync = false) {
  const file = $("file").files[0];
  if (!file) { log("pick a file first"); return; }
  $("before").src = URL.createObjectURL(file);
  $("after").removeAttribute("src");

  const form = new FormData();
  if (file.size > SLOT_THRESHOLD_BYTES) {
    try {
      form.append("uploadToken", await uploadViaSlot(file));
    } catch (e) { log(`slot upload failed: ${e.message}`); return; }
  } else {
    form.append("image", file, file.name);
  }
  if ($("prompt").value) form.append("prompt", $("prompt").value);

  const url = `${$("base").value}/v1/jobs${sync ? "?sync=1" : ""}`;
  const r = await fetch(url, {
    method: "POST",
    headers: { ...headers(), "Idempotency-Key": crypto.randomUUID() },
    body: form,
  });
  const body = await r.json();
  if (!r.ok) { log(`submit failed ${r.status}: ${body.detail || body.title}`); return; }
  log(`job ${body.id} ${body.status}`);
  refreshCredits();
  if (sync) { showResult(body.result); return; }

  // SSE status stream (fetch-based; EventSource cannot send Authorization)
  const resp = await fetch(`${$("base").value}/v1/jobs/${body.id}/stream`, { headers: headers() });
  const reader = resp.body.getReader();
  const decoder = new TextDecoder();
  let buf = "";
  for (;;) {
    const { done, value } = await reader.read();
    if (done) break;
    buf += decoder.decode(value, { stream: true });
    for (const chunk of buf.split("\n\n").slice(0, -1)) {
      const data = chunk.split("\n").find((l) => l.startsWith("data: "));
      if (!data) continue;
      const doc = JSON.parse(data.slice(6));
      log(`job ${doc.id} → ${doc.status}`);
      if (doc.status === "succeeded") showResult(doc.result);
    }
    buf = buf.split("\n\n").slice(-1)[0];
  }
}

$("btn-credits").addEventListener("click", () => refreshCredits());
$("btn-submit").addEventListener("click", () => submitJob());
$("btn-sync").addEventListener("click", () => submitJob(true));
