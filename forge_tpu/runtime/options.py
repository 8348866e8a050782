"""Runtime options registry: sectioned OptionInfo entries with persistence,
onchange hooks, and per-request overrides.

The behavioral twin of the reference's three-tier config system
(modules/options.py + shared_options.py ≈250 options + per-request
override_settings, processing.py:820-847): a typed registry, JSON
persistence, and a context manager for scoped overrides.


Coverage policy: every reference option name is registered so clients that
GET/POST /sdapi/v1/options or send override_settings keep working. A subset
is CONSUMED by this pipeline (grep the key to find the site); the rest are
SURFACE-PARITY options in three classes: (a) gradio-UI preferences with no
analog in the single-file SPA (gallery_height, js_modal_lightbox, ...),
(b) knobs for mechanisms that are always-on or architectural here —
batch_cond_uncond/pad_cond_uncond/persistent_cond_cache (the compiled CFG
always batches and chunk-equalizes; the cond cache persists),
upcast_attn (flash attention always uses f32 softmax accumulators),
randn_source (the Philox RNG is bit-exact to the reference's NV source) —
and (c) CUDA-era memory toggles with TPU replacements documented in
PERF.md. Feature options that would otherwise silently do nothing are
either implemented (s_min_uncond, beta_dist_*, cross_attention_optimization,
per-arch *_tile, interrogate_*, deepbooru_*, extra_networks_default_multiplier,
upscaler_for_img2img, vae_always_tiled) or deliberately removed with a
rationale (token merging, above)."""

from __future__ import annotations

import contextlib
import json
import os
import threading
from typing import Any, Callable, Dict, Optional


class OptionInfo:
    def __init__(self, default: Any, label: str, section: str = "general",
                 choices: Optional[list] = None, onchange: Optional[Callable] = None):
        self.default = default
        self.label = label
        self.section = section
        self.choices = choices
        self.onchange = onchange


# old forge-tpu key spellings kept as aliases of the reference-parity names
_KEY_ALIASES = {"emphasis_mode": "emphasis"}


class Options:
    def __init__(self):
        self._registry: Dict[str, OptionInfo] = {}
        self._values: Dict[str, Any] = {}
        self._lock = threading.RLock()
        self._overrides = threading.local()

    def add(self, key: str, info: OptionInfo):
        self._registry[key] = info

    def __getattr__(self, key: str):
        if key.startswith("_"):
            raise AttributeError(key)
        return self.get(key)

    def get(self, key: str):
        key = _KEY_ALIASES.get(key, key)
        ov = getattr(self._overrides, "stack", None)
        if ov:
            for frame in reversed(ov):
                if key in frame:
                    return frame[key]
        with self._lock:
            if key in self._values:
                return self._values[key]
            if key in self._registry:
                return self._registry[key].default
        raise KeyError(key)

    def set(self, key: str, value: Any, run_onchange: bool = True):
        key = _KEY_ALIASES.get(key, key)
        with self._lock:
            old = self.get(key) if key in self._registry else None
            self._values[key] = value
            info = self._registry.get(key)
        if run_onchange and info is not None and info.onchange and old != value:
            info.onchange()

    @contextlib.contextmanager
    def override(self, values: Dict[str, Any]):
        """Per-request scoped overrides (reference override_settings)."""
        if not hasattr(self._overrides, "stack"):
            self._overrides.stack = []
        self._overrides.stack.append(
            {_KEY_ALIASES.get(k, k): v for k, v in values.items()})
        try:
            yield
        finally:
            self._overrides.stack.pop()

    def save(self, path: str):
        with self._lock:
            data = dict(self._values)
        with open(path, "w") as f:
            json.dump(data, f, indent=2, default=str)

    def load(self, path: str):
        if not os.path.exists(path):
            return
        with open(path) as f:
            data = json.load(f)
        with self._lock:
            self._values.update(data)

    def dump_registry(self) -> Dict[str, Dict[str, Any]]:
        return {
            k: {"default": i.default, "label": i.label, "section": i.section,
                "value": self.get(k)}
            for k, i in self._registry.items()
        }


opts = Options()


def _O(default, label, section="general", choices=None, onchange=None):
    return OptionInfo(default, label, section, choices=choices,
                      onchange=onchange)


# Reference-parity option set (modules/shared_options.py:36-436 + Forge
# extras from modules_forge/). Keys keep the reference's exact names so
# /sdapi/v1/options get/set and override_settings payloads written for the
# reference work unchanged. Options whose machinery differs on TPU (CUDA
# cross-attention choices, gradio theming internals) are registered for API
# compatibility and read wherever an equivalent knob exists.
_DEFAULTS = {
    # -- saving images/grids (shared_options.py options_templates "saving")
    "samples_save": _O(True, "Always save generated images", "saving"),
    "samples_format": _O("png", "Image format", "saving", ["png", "jpg", "webp"]),
    "samples_filename_pattern": _O("", "Images filename pattern", "saving"),
    "save_images_add_number": _O(True, "Add number to filename", "saving"),
    "save_images_replace_action": _O("Replace", "Saving an existing image", "saving",
                                     ["Replace", "Add number suffix"]),
    "grid_save": _O(True, "Always save grids", "saving"),
    "grid_format": _O("png", "Grid format", "saving", ["png", "jpg", "webp"]),
    "grid_extended_filename": _O(False, "Extended grid filename", "saving"),
    "grid_only_if_multiple": _O(True, "Only save grid for multiple images", "saving"),
    "grid_prevent_empty_spots": _O(False, "Prevent empty grid spots", "saving"),
    "n_rows": _O(-1, "Grid row count (-1 auto)", "saving"),
    "save_images_before_face_restoration": _O(False, "Save before face restore", "saving"),
    "save_images_before_highres_fix": _O(False, "Save before hires fix", "saving"),
    "save_images_before_color_correction": _O(False, "Save before color correction", "saving"),
    "save_mask": _O(False, "Save inpaint mask", "saving"),
    "save_mask_composite": _O(False, "Save mask composite", "saving"),
    "jpeg_quality": _O(80, "JPEG/WebP quality", "saving"),
    "webp_lossless": _O(False, "Lossless WebP", "saving"),
    "export_for_4chan": _O(True, "Downscale large images for export", "saving"),
    "img_downscale_threshold": _O(4.0, "Downscale threshold (MB)", "saving"),
    "target_side_length": _O(4000, "Downscale target side", "saving"),
    "img_max_size_mp": _O(200, "Max image size (MP)", "saving"),
    "use_original_name_batch": _O(True, "Original names in batch", "saving"),
    "use_upscaler_name_as_suffix": _O(False, "Upscaler name suffix", "saving"),
    "save_write_log_csv": _O(True, "Write log.csv next to saved images", "saving"),
    "save_txt": _O(False, "Write .txt infotext next to image", "saving"),
    "save_init_img": _O(False, "Save img2img init images", "saving"),
    "save_incomplete_images": _O(False, "Save interrupted images", "saving"),
    "save_write_params_txt": _O(True, "Write params.txt after generation", "saving"),
    # -- output paths
    "outdir_samples": _O("", "Output dir for all images", "paths"),
    "outdir_txt2img_samples": _O("outputs/txt2img-images", "txt2img out dir", "paths"),
    "outdir_img2img_samples": _O("outputs/img2img-images", "img2img out dir", "paths"),
    "outdir_extras_samples": _O("outputs/extras-images", "extras out dir", "paths"),
    "outdir_grids": _O("", "Output dir for grids", "paths"),
    "outdir_txt2img_grids": _O("outputs/txt2img-grids", "txt2img grid dir", "paths"),
    "outdir_img2img_grids": _O("outputs/img2img-grids", "img2img grid dir", "paths"),
    "outdir_save": _O("log/images", "Save-button dir", "paths"),
    "outdir_init_images": _O("outputs/init-images", "Init images dir", "paths"),
    "save_to_dirs": _O(True, "Save to date subdirectories", "paths"),
    "grid_save_to_dirs": _O(True, "Save grids to subdirectories", "paths"),
    "directories_filename_pattern": _O("[date]", "Directory name pattern", "paths"),
    "directories_max_prompt_words": _O(8, "Max prompt words in [prompt_words]", "paths"),
    # -- upscaling
    "ESRGAN_tile": _O(192, "ESRGAN tile size (0 = no tiling)", "upscaling"),
    "ESRGAN_tile_overlap": _O(8, "ESRGAN tile overlap", "upscaling"),
    "DAT_tile": _O(192, "DAT tile size", "upscaling"),
    "DAT_tile_overlap": _O(8, "DAT tile overlap", "upscaling"),
    "SWIN_tile": _O(192, "SwinIR tile size", "upscaling"),
    "SWIN_tile_overlap": _O(8, "SwinIR tile overlap", "upscaling"),
    "upscaler_for_img2img": _O(None, "Upscaler for img2img resize", "upscaling"),
    # -- face restoration
    "face_restoration": _O(False, "Restore faces on all images", "face"),
    "face_restoration_model": _O("CodeFormer", "Face restoration model", "face",
                                 ["CodeFormer", "GFPGAN"]),
    "code_former_weight": _O(0.5, "CodeFormer weight (0 = max effect)", "face"),
    "face_restoration_unload": _O(False, "Unload face restorer after use", "face"),
    # -- system
    "auto_launch_browser": _O("Local", "Auto-launch browser", "system",
                              ["Disable", "Local", "Remote"]),
    "show_warnings": _O(False, "Show warnings in UI", "system"),
    "memmon_poll_rate": _O(8, "Memory monitor polls/s", "system"),
    "samples_log_stdout": _O(False, "Log generation params to stdout", "system"),
    "multiple_tqdm": _O(True, "Per-job progress bars", "system"),
    "enable_upscale_progressbar": _O(True, "Tiled upscale progress bar", "system"),
    "list_hidden_files": _O(True, "List models from hidden dirs", "system"),
    "dump_stacks_on_signal": _O(False, "Dump stacks on SIGUSR1", "system"),
    "profiling_enable": _O(False, "Capture jax profiler trace per generation", "profiling"),
    "profiling_filename": _O("trace.json", "Profiling trace path", "profiling"),
    # -- API
    "api_enable_requests": _O(True, "Allow http:// urls as input images", "api"),
    "api_forbid_local_requests": _O(True, "Forbid local-network urls", "api"),
    "api_useragent": _O("", "User agent for requests", "api"),
    # -- SD / model
    "sd_model_checkpoint": _O(None, "Checkpoint", "sd"),
    "sd_checkpoints_limit": _O(1, "Max loaded checkpoints", "sd"),
    "sd_checkpoint_cache": _O(0, "Checkpoint RAM cache size", "sd"),
    "sd_unet": _O("Automatic", "UNet override", "sd"),
    "emphasis": _O("Original", "Emphasis mode", "sd",
                   ["None", "Ignore", "Original", "No norm"]),
    "enable_batch_seeds": _O(True, "Sequential seeds in batch", "sd"),
    "comma_padding_backtrack": _O(20, "Prompt comma backtrack", "sd"),
    "sdxl_clip_l_skip": _O(False, "Clip skip affects SDXL clip-L", "sd"),
    "CLIP_stop_at_last_layers": _O(1, "Clip skip", "sd"),
    "upcast_attn": _O(False, "Upcast attention to float32", "sd"),
    "randn_source": _O("NV", "RNG source", "compat", ["GPU", "NV", "CPU"]),
    "tiling": _O(False, "Seamless tiling (circular conv padding)", "sd"),
    "hires_fix_refiner_pass": _O("second pass", "Hires fix: which pass the refiner runs in",
                                 "sd", ["first pass", "second pass", "both passes"]),
    # -- SDXL/refiner conds (backend/diffusion_engine/sdxl.py size/aesthetic conds)
    "sdxl_crop_top": _O(0, "SDXL crop top", "sdxl"),
    "sdxl_crop_left": _O(0, "SDXL crop left", "sdxl"),
    "sdxl_refiner_low_aesthetic_score": _O(2.5, "Refiner negative aesthetic score", "sdxl"),
    "sdxl_refiner_high_aesthetic_score": _O(6.0, "Refiner positive aesthetic score", "sdxl"),
    "sd3_enable_t5": _O(False, "SD3: load T5-XXL", "sd3"),
    # -- VAE
    "sd_vae": _O("Automatic", "VAE", "vae"),
    "sd_vae_overrides_per_model_preferences": _O(True, "Selected VAE overrides per-model", "vae"),
    "auto_vae_precision_bfloat16": _O(False, "VAE bf16 on NaN", "vae"),
    "auto_vae_precision": _O(True, "VAE fp32 retry on NaN", "vae"),
    "vae_dtype": _O("auto", "VAE compute dtype (--no-half-vae sets float32)",
                    "vae", ["auto", "bfloat16", "float32"]),
    "sd_vae_encode_method": _O("Full", "VAE encode method", "vae", ["Full", "TAESD"]),
    "sd_vae_decode_method": _O("Full", "VAE decode method", "vae", ["Full", "TAESD"]),
    # -- img2img
    "inpainting_mask_weight": _O(1.0, "Inpaint conditioning mask strength", "img2img"),
    "initial_noise_multiplier": _O(1.0, "img2img noise multiplier", "img2img"),
    "img2img_extra_noise": _O(0.0, "img2img extra noise", "img2img"),
    "img2img_color_correction": _O(False, "Color-correct img2img to init image", "img2img"),
    "img2img_fix_steps": _O(False, "Run full step count regardless of strength", "img2img"),
    "img2img_background_color": _O("#ffffff", "img2img transparent background fill", "img2img"),
    "return_mask": _O(False, "Return inpaint mask with results", "img2img"),
    "return_mask_composite": _O(False, "Return mask composite", "img2img"),
    "overlay_inpaint": _O(True, "Overlay original over inpaint result", "img2img"),
    # -- optimizations
    "cross_attention_optimization": _O(
        "Automatic", "Attention backend", "perf",
        ["Automatic", "Flash (Pallas)", "XLA"],
        onchange=lambda: __import__(
            "forge_tpu.ops.attention", fromlist=["set_attention_impl"]
        ).set_attention_impl(
            {"Automatic": None, "Flash (Pallas)": "flash", "XLA": "xla"}[
                _cross_attn_value()])),
    "s_min_uncond": _O(0.0, "NGMS: skip uncond below sigma", "perf"),
    "s_min_uncond_all": _O(False, "NGMS on all steps", "perf"),
    # Token merging (reference backend/misc/tomesd.py) is deliberately NOT
    # ported: it exists to shrink the materialized [L,L] attention matrix on
    # memory-bound GPUs; under blockwise flash attention the logits never
    # materialize, and ToMe's gather/scatter token indexing breaks XLA's
    # static shapes for no memory win. The options are omitted rather than
    # registered-but-dead.
    "jit_cache_size": _O(16, "Max compiled sampler programs kept resident "
                         "(LRU; evicted executables free their HBM)", "perf"),
    # NeverOOM equivalents (reference sd_forge_neveroom: force-maximize
    # offload / always-tiled VAE instead of reactive OOM handling)
    "vae_always_tiled": _O(False, "NeverOOM: always use tiled VAE decode/encode",
                           "perf"),
    "unet_always_offload": _O(False, "NeverOOM: maximize host offload of UNet "
                              "weights (streams from pinned host)", "perf"),
    # extra-options-section equivalent: option names surfaced as quick
    # controls in the generation tabs, applied per-request as overrides
    "extra_options_txt2img": _O("", "Options shown in the txt2img tab "
                                "(comma-separated names)", "ui"),
    "extra_options_img2img": _O("", "Options shown in the img2img tab "
                                "(comma-separated names)", "ui"),
    "localization": _O("None", "Localization (localizations/<name>.json "
                       "string-replacement dict applied to the UI)", "ui"),
    "pad_cond_uncond": _O(False, "Pad cond/uncond to same length", "perf"),
    "persistent_cond_cache": _O(True, "Keep cond cache across generations", "perf"),
    "batch_cond_uncond": _O(True, "Batch cond+uncond in one call", "perf"),
    "fp8_storage": _O("Disable", "FP8 weight storage", "perf",
                      ["Disable", "Enable for SDXL", "Enable"]),
    "cache_fp16_weight": _O(False, "Cache fp16 master weights for LoRA-on-fp8", "perf"),
    # forge-tpu specific perf knobs (analog of backend/args.py flags)
    "attention_impl": _O("auto", "Attention implementation", "perf",
                         ["auto", "flash", "xla"]),
    "compute_dtype": _O("auto", "UNet compute dtype", "perf",
                        ["auto", "bfloat16", "float32"]),
    # -- compatibility
    "auto_backcompat": _O(True, "Automatic backward compatibility", "compat"),
    "use_old_emphasis_implementation": _O(False, "Old emphasis implementation", "compat"),
    "use_old_karras_scheduler_sigmas": _O(False, "Old Karras sigma range", "compat"),
    "no_dpmpp_sde_batch_determinism": _O(False, "Old DPM++ SDE batch behavior", "compat"),
    "use_old_hires_fix_width_height": _O(False, "Old hires-fix sizing", "compat"),
    "hires_fix_use_firstpass_conds": _O(False, "Hires pass reuses first-pass conds", "compat"),
    "use_downcasted_alpha_bar": _O(False, "Downcast alphas_cumprod", "compat"),
    "refiner_switch_by_sample_steps": _O(False, "Refiner switch by absolute steps", "compat"),
    "disable_nan_check": _O(False, "Skip NaN checks after UNet/VAE", "compat"),
    # -- interrogate
    "interrogate_keep_models_in_memory": _O(False, "Keep interrogate models loaded", "interrogate"),
    "interrogate_return_ranks": _O(False, "Include rank of tags", "interrogate"),
    "interrogate_clip_num_beams": _O(1, "BLIP beams", "interrogate"),
    "interrogate_clip_min_length": _O(24, "BLIP min length", "interrogate"),
    "interrogate_clip_max_length": _O(48, "BLIP max length", "interrogate"),
    "interrogate_clip_dict_limit": _O(1500, "CLIP dictionary limit", "interrogate"),
    "interrogate_clip_skip_categories": _O([], "CLIP skip categories", "interrogate"),
    "interrogate_deepbooru_score_threshold": _O(0.5, "deepbooru score threshold", "interrogate"),
    "deepbooru_sort_alpha": _O(True, "deepbooru alphabetical sort", "interrogate"),
    "deepbooru_use_spaces": _O(True, "deepbooru spaces in tags", "interrogate"),
    "deepbooru_escape": _O(True, "deepbooru escape brackets", "interrogate"),
    "deepbooru_filter_tags": _O("", "deepbooru filtered tags", "interrogate"),
    # -- extra networks
    "extra_networks_default_multiplier": _O(1.0, "Default LoRA multiplier", "extra_networks"),
    "extra_networks_hidden_models": _O("When searched", "Show hidden models", "extra_networks",
                                       ["Always", "When searched", "Never"]),
    "extra_networks_add_text_separator": _O(" ", "Prompt-add separator", "extra_networks"),
    "textual_inversion_add_hashes_to_infotext": _O(True, "TI hashes in infotext", "extra_networks"),
    "sd_hypernetwork": _O("None", "Hypernetwork (legacy)", "extra_networks"),
    # -- UI
    "return_grid": _O(True, "Show grid in results", "ui"),
    "do_not_show_images": _O(False, "Never show images in UI", "ui"),
    "js_modal_lightbox": _O(True, "Fullscreen image viewer", "ui"),
    "gallery_height": _O("", "Gallery height", "ui"),
    "compact_prompt_box": _O(False, "Compact prompt layout", "ui"),
    "samplers_in_dropdown": _O(True, "Samplers as dropdown", "ui"),
    "dimensions_and_batch_together": _O(True, "W/H next to batch", "ui"),
    "hires_fix_show_sampler": _O(False, "Hires: show sampler selection", "ui"),
    "hires_fix_show_prompts": _O(False, "Hires: show prompts", "ui"),
    "interrupt_after_current": _O(True, "Interrupt finishes current image", "ui"),
    "localization": _O("None", "Localization", "ui"),
    "quick_setting_list": _O([], "Quicksettings list", "ui"),
    "hidden_tabs": _O([], "Hidden UI tabs", "ui"),
    "gradio_theme": _O("Default", "Theme", "ui"),
    "show_progress_in_title": _O(True, "Progress in page title", "ui"),
    "send_seed": _O(True, "Send seed between tabs", "ui"),
    "send_size": _O(True, "Send size between tabs", "ui"),
    # -- infotext
    "enable_pnginfo": _O(True, "Write infotext into images", "infotext"),
    "stealth_pnginfo_option": _O("Alpha", "Stealth infotext mode", "infotext",
                                 ["Alpha", "RGB", "None"]),
    "add_model_name_to_info": _O(True, "Model name in infotext", "infotext"),
    "add_model_hash_to_info": _O(True, "Model hash in infotext", "infotext"),
    "add_vae_name_to_info": _O(True, "VAE name in infotext", "infotext"),
    "add_vae_hash_to_info": _O(True, "VAE hash in infotext", "infotext"),
    "add_user_name_to_info": _O(False, "User name in infotext", "infotext"),
    "add_version_to_infotext": _O(True, "Version in infotext", "infotext"),
    "disable_weights_auto_swap": _O(True, "Ignore checkpoint from infotext paste", "infotext"),
    "infotext_skip_pasting": _O([], "Infotext keys to skip pasting", "infotext"),
    "infotext_styles": _O("Apply if any", "Infotext style extraction", "infotext",
                          ["Ignore", "Apply", "Discard", "Apply if any"]),
    # -- live previews
    "show_progressbar": _O(True, "Show progress bar", "live_previews"),
    "interrupt_poll_steps": _O(0, "Split the compiled loop every N steps so "
                               "interrupt takes effect mid-sampling (0 = off; "
                               "seams reset multistep history)", "live_previews"),
    "live_previews_enable": _O(True, "Live previews", "live_previews"),
    "live_previews_image_format": _O("png", "Live preview format", "live_previews",
                                     ["jpeg", "png", "webp"]),
    "show_progress_grid": _O(True, "Preview grid for whole batch", "live_previews"),
    "show_progress_every_n_steps": _O(10, "Live preview period (steps; -1 = off)", "live_previews"),
    "show_progress_type": _O("Approx cheap", "Live preview method", "live_previews",
                             ["Full", "Approx NN", "Approx cheap", "TAESD"]),
    "live_preview_content": _O("Prompt", "Live preview subject", "live_previews",
                               ["Combined", "Prompt", "Negative prompt"]),
    "live_preview_refresh_period": _O(1000, "Preview poll period (ms)", "live_previews"),
    "live_preview_fast_interrupt": _O(False, "Return preview on interrupt", "live_previews"),
    # -- sampler params
    "hide_samplers": _O([], "Hidden samplers", "sampler"),
    "eta_ddim": _O(0.0, "Eta for DDIM", "sampler"),
    "eta_ancestral": _O(1.0, "Eta for ancestral samplers", "sampler"),
    "ddim_discretize": _O("uniform", "DDIM discretize", "sampler", ["uniform", "quad"]),
    "s_churn": _O(0.0, "Sigma churn", "sampler"),
    "s_tmin": _O(0.0, "Sigma tmin", "sampler"),
    "s_tmax": _O(0.0, "Sigma tmax (0 = inf)", "sampler"),
    "s_noise": _O(1.0, "Sigma noise", "sampler"),
    "eta_noise_seed_delta": _O(0, "ENSD", "sampler"),
    "k_sched_type": _O("Automatic", "Scheduler type override", "sampler"),
    "sigma_min": _O(0.0, "Sigma min override", "sampler"),
    "sigma_max": _O(0.0, "Sigma max override", "sampler"),
    "rho": _O(0.0, "Schedule rho override", "sampler"),
    "skip_early_cond": _O(0.0, "Ignore negative prompt for first N% steps", "sampler"),
    "beta_dist_alpha": _O(0.6, "Beta schedule alpha", "sampler"),
    "beta_dist_beta": _O(0.6, "Beta schedule beta", "sampler"),
    "sgm_noise_multiplier": _O(False, "SGM noise multiplier", "sampler"),
    # -- postprocessing
    "postprocessing_enable_in_main_ui": _O([], "Postprocessing in main UI", "postprocessing"),
    "postprocessing_disable_in_extras": _O([], "Postprocessing hidden in extras", "postprocessing"),
    "postprocessing_operation_order": _O([], "Postprocessing order", "postprocessing"),
    "upscaling_max_images_in_cache": _O(5, "Upscale cache size", "postprocessing"),
    # -- extensions
    "disabled_extensions": _O([], "Disabled extensions", "extensions"),
    "disable_all_extensions": _O("none", "Disable all extensions", "extensions",
                                 ["none", "extra", "all"]),
    # -- Forge extras (modules_forge: dtype/memory knobs, TPU analogs)
    "forge_unet_storage_dtype": _O("Automatic", "UNet storage dtype", "forge",
                                   ["Automatic", "bnb-nf4", "gguf-q4_0", "gguf-q8_0",
                                    "float8-e4m3fn", "bfloat16"]),
    "forge_inference_memory": _O(1024, "Reserved inference memory (MB)", "forge"),
    "forge_async_loading": _O("Queue", "Async weight loading", "forge", ["Queue", "Async"]),
    "forge_preset": _O("sd", "UI preset", "forge", ["sd", "xl", "flux", "all"]),
    "forge_additional_modules": _O([], "Additional modules (VAE/TE)", "forge"),
}
for _k, _v in _DEFAULTS.items():
    opts.add(_k, _v)

def _cross_attn_value() -> str:
    return str(opts.get("cross_attention_optimization"))
