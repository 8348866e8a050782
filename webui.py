"""forge-tpu server entrypoint.

    python webui.py --api --listen --port 7860 \
        --ckpt-dir models/Stable-diffusion --embeddings-dir embeddings

The analog of the reference's webui.py/launch.py bootstrap: no venv/pip/git
machinery (the environment is immutable), just model discovery + worker
thread + REST server.
"""

from __future__ import annotations

import argparse
import sys


def parse_args(argv=None):
    ap = argparse.ArgumentParser(description="forge-tpu: TPU-native Stable Diffusion server")
    ap.add_argument("--listen", action="store_true", help="bind 0.0.0.0 instead of localhost")
    ap.add_argument("--port", type=int, default=7860)
    ap.add_argument("--api", action="store_true", help="(always on; kept for CLI compat)")
    ap.add_argument("--ckpt-dir", default="models/Stable-diffusion")
    ap.add_argument("--vae-dir", default="models/VAE")
    ap.add_argument("--embeddings-dir", default="embeddings")
    ap.add_argument("--lora-dir", default="models/Lora")
    ap.add_argument("--ckpt", default=None, help="checkpoint to load at startup")
    ap.add_argument("--attention", choices=["auto", "flash", "xla"], default="auto")
    ap.add_argument("--unet-dtype", choices=["auto", "bfloat16", "float32"], default="auto")
    ap.add_argument("--unet-offload", action="store_true",
                    help="stream UNet weights from pinned host memory (low-HBM "
                         "mode; the reference's CPU-swap analog)")
    ap.add_argument("--gpu-weights-mb", type=int, default=0,
                    help="HBM budget for resident weights in MB (0 = auto); "
                         "the reference's 'GPU Weights' slider")
    ap.add_argument("--api-auth", default=None,
                    help='HTTP basic auth for the API: "user:pass[,user2:pass2]"')
    ap.add_argument("--config", default="config.json", help="options persistence file")
    return ap.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    from forge_tpu.api.server import CMD_FLAGS

    CMD_FLAGS.update(vars(args))

    from forge_tpu.api.server import serve
    from forge_tpu.ops.attention import set_attention_impl
    from forge_tpu.runtime.models import ModelManager
    from forge_tpu.runtime.options import opts
    from forge_tpu.runtime.queue import work_queue

    opts.load(args.config)
    if args.attention != "auto":
        set_attention_impl(args.attention)

    # extension discovery + script loading (runtime/extensions.py; reference
    # initialize.py list_extensions → scripts.load_scripts)
    from forge_tpu.runtime.extensions import load_extension_scripts
    from forge_tpu.runtime.scripts import fire, scripts_img2img, scripts_txt2img

    exts = load_extension_scripts(scripts_txt2img)
    load_extension_scripts(scripts_img2img)
    if exts:
        enabled = sum(e.enabled for e in exts)
        print(f"extensions: {enabled} enabled / {len(exts)} found")

    models = ModelManager(
        checkpoint_dirs=[args.ckpt_dir],
        vae_dirs=[args.vae_dir],
        embeddings_dir=args.embeddings_dir,
    )
    print(f"found {len(models.checkpoints)} checkpoints in {args.ckpt_dir}")

    if args.ckpt:
        print(f"loading {args.ckpt} ...")
        engine = work_queue.run_and_wait(models.load, args.ckpt)
        opts.set("sd_model_checkpoint", args.ckpt, run_onchange=False)
        if args.unet_offload:
            budget = args.gpu_weights_mb * (1 << 20) if args.gpu_weights_mb else None
            print(engine.enable_host_offload(budget))
    elif models.checkpoints:
        first = next(iter(models.checkpoints))
        opts.set("sd_model_checkpoint", first, run_onchange=False)

    host = "0.0.0.0" if args.listen else "127.0.0.1"
    serve(models, host, args.port, api_auth=args.api_auth)


if __name__ == "__main__":
    sys.exit(main())
