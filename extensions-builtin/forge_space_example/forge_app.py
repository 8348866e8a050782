"""Example Space (reference extensions-builtin/forge_space_example/
forge_app.py): the minimal template users copy to write their own Space —
a greeter that echoes the input. Demonstrates the two-file contract the
SpaceManager expects (space_meta.json + forge_app.py serving --host/--port).

Run: python forge_app.py --host 127.0.0.1 --port 7870
"""

import argparse
import json
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

PAGE = """<!doctype html><html><head><title>Example Space</title>
<style>body{font-family:sans-serif;background:#111;color:#eee;max-width:480px;
margin:2em auto}button{padding:.5em 1.5em}</style></head><body>
<h2>Example Space</h2>
<input type=text id=name value=world>
<input type=range id=intensity min=1 max=5 value=1>
<button onclick="go()">Greet</button>
<p id=out></p>
<script>
async function go(){
 const r=await fetch('/process',{method:'POST',headers:{'Content-Type':'application/json'},
  body:JSON.stringify({name:document.getElementById('name').value,
   intensity:parseInt(document.getElementById('intensity').value)})});
 document.getElementById('out').textContent=(await r.json()).greeting;
}
</script></body></html>"""


def greet(name: str, intensity: int) -> str:
    return "Hello, " + name + "!" * int(intensity)


class Handler(BaseHTTPRequestHandler):
    def log_message(self, *a):
        pass

    def _send(self, code, body, ctype="application/json"):
        data = body if isinstance(body, bytes) else body.encode()
        self.send_response(code)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def do_GET(self):
        self._send(200, PAGE, "text/html")

    def do_POST(self):
        try:
            length = int(self.headers.get("Content-Length") or 0)
            body = json.loads(self.rfile.read(length))
            self._send(200, json.dumps({"greeting": greet(
                str(body.get("name", "world")), int(body.get("intensity", 1)))}))
        except Exception as e:  # noqa: BLE001 — report to the client
            self._send(500, json.dumps({"error": str(e)}))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=7876)
    args = ap.parse_args()
    srv = ThreadingHTTPServer((args.host, args.port), Handler)
    print(f"example space on http://{args.host}:{args.port}", flush=True)
    srv.serve_forever()


if __name__ == "__main__":
    main()
