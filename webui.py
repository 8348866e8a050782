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
    """CLI surface audited against the reference's modules/cmd_args.py (~80
    flags). Flags here are the ones with real behavior on TPU; the omitted
    reference flags fall into: launch.py venv/pip machinery (environment is
    immutable), CUDA attention/VRAM selection (--xformers, --opt-sdp-*,
    --medvram/--lowvram → replaced by --unet-offload/--gpu-weights-mb,
    --attention), gradio-specific plumbing (--share/--ngrok/--theme/
    --gradio-*), and flags the reference itself marks 'does not do
    anything'."""
    ap = argparse.ArgumentParser(description="forge-tpu: TPU-native Stable Diffusion server")
    # -- network / serving
    ap.add_argument("--listen", action="store_true", help="bind 0.0.0.0 instead of localhost")
    ap.add_argument("--server-name", default=None,
                    help="hostname/IP to bind (overrides --listen)")
    ap.add_argument("--port", type=int, default=7860)
    ap.add_argument("--api", action="store_true", help="(always on; kept for CLI compat)")
    ap.add_argument("--nowebui", action="store_true",
                    help="serve the API only; '/' returns 404")
    ap.add_argument("--api-auth", default=None,
                    help='HTTP basic auth for the API: "user:pass[,user2:pass2]"')
    ap.add_argument("--api-log", action="store_true",
                    help="log every API request to stdout")
    ap.add_argument("--api-server-stop", action="store_true",
                    help="enable server stop/restart/kill via API")
    ap.add_argument("--cors-allow-origins", default=None,
                    help="comma-separated list of allowed CORS origins")
    ap.add_argument("--cors-allow-origins-regex", default=None,
                    help="single regex matching allowed CORS origins")
    ap.add_argument("--tls-keyfile", default=None,
                    help="TLS key file (requires --tls-certfile)")
    ap.add_argument("--tls-certfile", default=None,
                    help="TLS certificate file (requires --tls-keyfile)")
    ap.add_argument("--timeout-keep-alive", type=int, default=30,
                    help="idle keep-alive timeout for API connections (s)")
    # -- model discovery
    ap.add_argument("--data-dir", default=".",
                    help="base directory for config/outputs/model dirs")
    ap.add_argument("--ckpt-dir", default="models/Stable-diffusion")
    ap.add_argument("--vae-dir", default="models/VAE")
    ap.add_argument("--embeddings-dir", default="embeddings")
    ap.add_argument("--lora-dir", default="models/Lora")
    ap.add_argument("--hypernetwork-dir", default="models/hypernetworks")
    ap.add_argument("--ckpt", default=None, help="checkpoint to load at startup")
    ap.add_argument("--vae-path", default=None,
                    help="VAE to force for every checkpoint load")
    ap.add_argument("--skip-load-model-at-start", action="store_true",
                    help="do not select/load a checkpoint at startup")
    ap.add_argument("--no-hashing", action="store_true",
                    help="skip checkpoint hashing (faster startup/infotext)")
    # -- compute
    ap.add_argument("--attention", choices=["auto", "flash", "xla"], default="auto")
    ap.add_argument("--unet-dtype", choices=["auto", "bfloat16", "float32"], default="auto")
    ap.add_argument("--no-half", action="store_true",
                    help="run the diffusion model in float32 (same as --unet-dtype float32)")
    ap.add_argument("--no-half-vae", action="store_true",
                    help="run the VAE in float32")
    ap.add_argument("--vae-dtype", choices=["auto", "bfloat16", "float32"],
                    default="auto", help="VAE compute dtype (reference "
                    "--vae-in-bf16/fp16/fp32)")
    ap.add_argument("--disable-nan-check", action="store_true",
                    help="skip NaN checks on latents/images")
    ap.add_argument("--unet-offload", action="store_true",
                    help="stream UNet weights from pinned host memory (low-HBM "
                         "mode; the reference's CPU-swap analog)")
    ap.add_argument("--gpu-weights-mb", type=int, default=0,
                    help="HBM budget for resident weights in MB (0 = auto); "
                         "the reference's 'GPU Weights' slider")
    # -- settings / extensions
    ap.add_argument("--config", default="config.json", help="options persistence file")
    ap.add_argument("--freeze-settings", action="store_true",
                    help="disable editing of all settings via the API/UI")
    ap.add_argument("--freeze-specific-settings", default=None,
                    help="comma-separated option names to make read-only")
    ap.add_argument("--styles-file", default="styles.csv",
                    help="prompt styles csv")
    ap.add_argument("--localizations-dir", default="localizations",
                    help="directory of <name>.json UI localization dicts")
    ap.add_argument("--disable-all-extensions", action="store_true",
                    help="do not load any extension scripts")
    ap.add_argument("--disable-extra-extensions", action="store_true",
                    help="load only builtin extension scripts")
    ap.add_argument("--allow-code", action="store_true",
                    help="enable the 'Custom code' script (executes "
                         "request-supplied python — reference --allow-code)")
    ap.add_argument("--enable-insecure-extension-access", action="store_true",
                    help="allow extension install/update via the API "
                         "(executes fetched code — off by default)")
    ap.add_argument("--loglevel", default=None,
                    help="python logging level (DEBUG/INFO/WARNING/ERROR)")
    return ap.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    from forge_tpu.api.server import CMD_FLAGS

    CMD_FLAGS.update(vars(args))

    if args.loglevel:
        import logging

        logging.basicConfig(level=getattr(logging, args.loglevel.upper(),
                                          logging.INFO))

    from forge_tpu.api.server import serve
    from forge_tpu.ops.attention import set_attention_impl
    from forge_tpu.runtime import models as models_mod
    from forge_tpu.runtime.models import ModelManager
    from forge_tpu.runtime.options import opts
    from forge_tpu.runtime.queue import work_queue

    opts.load(args.config)
    if args.attention != "auto":
        set_attention_impl(args.attention)
    # dtype flags → options (reference --no-half/--no-half-vae; backend
    # args_parser → dynamic_args['forge_unet_storage_dtype'])
    unet_dtype = "float32" if args.no_half else args.unet_dtype
    if unet_dtype != "auto":
        opts.set("compute_dtype", unet_dtype, run_onchange=False)
    if args.no_half_vae:
        opts.set("vae_dtype", "float32", run_onchange=False)
    elif args.vae_dtype != "auto":
        opts.set("vae_dtype", args.vae_dtype, run_onchange=False)
    if args.localizations_dir != "localizations":
        from forge_tpu.runtime import localization as loc_mod

        default_list = loc_mod.list_localizations

        def list_with_dir(dirs=None):
            return default_list(dirs or [args.localizations_dir])

        loc_mod.list_localizations = list_with_dir
    if args.disable_nan_check:
        opts.set("disable_nan_check", True, run_onchange=False)
    if args.no_hashing:
        models_mod.NO_HASHING = True
    if args.styles_file != "styles.csv":
        from forge_tpu.runtime import styles as styles_mod

        styles_mod.prompt_styles = styles_mod.StyleDatabase([args.styles_file])

    # extension discovery + script loading (runtime/extensions.py; reference
    # initialize.py list_extensions → scripts.load_scripts;
    # --disable-all-extensions / --disable-extra-extensions per cmd_args)
    from forge_tpu.runtime.extensions import load_extension_scripts
    from forge_tpu.runtime.scripts import fire, scripts_img2img, scripts_txt2img

    if not args.disable_all_extensions:
        base_dirs = None
        if args.disable_extra_extensions:
            from forge_tpu.runtime.extensions import BUILTIN_DIR

            base_dirs = [BUILTIN_DIR]
        exts = load_extension_scripts(scripts_txt2img, base_dirs=base_dirs)
        load_extension_scripts(scripts_img2img, base_dirs=base_dirs)
        if exts:
            enabled = sum(e.enabled for e in exts)
            print(f"extensions: {enabled} enabled / {len(exts)} found")

    models = ModelManager(
        checkpoint_dirs=[args.ckpt_dir],
        vae_dirs=[args.vae_dir],
        embeddings_dir=args.embeddings_dir,
    )
    print(f"found {len(models.checkpoints)} checkpoints in {args.ckpt_dir}")

    if args.ckpt and not args.skip_load_model_at_start:
        print(f"loading {args.ckpt} ...")
        engine = work_queue.run_and_wait(models.load, args.ckpt,
                                         vae=args.vae_path)
        opts.set("sd_model_checkpoint", args.ckpt, run_onchange=False)
        if args.unet_offload:
            budget = args.gpu_weights_mb * (1 << 20) if args.gpu_weights_mb else None
            print(engine.enable_host_offload(budget))
    elif models.checkpoints:
        first = next(iter(models.checkpoints))
        opts.set("sd_model_checkpoint", first, run_onchange=False)

    host = args.server_name or ("0.0.0.0" if args.listen else "127.0.0.1")
    serve(models, host, args.port, api_auth=args.api_auth)


if __name__ == "__main__":
    sys.exit(main())
