"""Generate the cfgs/default/ tree (reference cfgs/default/** parity, adapted
to fourm_tpu CLI flag names). Rerun after changing templates."""
import os, pathlib

ROOT = pathlib.Path(__file__).resolve().parents[1] / "cfgs" / "default"

MOD7_IN = "rgb@224-tok_rgb@224-tok_depth@224-tok_semseg@224-tok_normal@224-tok_clip@224-caption-det"
MOD7_OUT = "tok_rgb@224-tok_depth@224-tok_semseg@224-tok_normal@224-tok_clip@224-caption-det"
MOD21_IN = ("caption-t5_caption-det-metadata-rgb@224-tok_rgb@224-tok_normal@224-tok_depth@224-"
            "tok_semseg@224-tok_clip@224-human_poses-tok_dinov2@224-tok_dinov2_global-"
            "tok_imagebind@224-tok_imagebind_global-tok_sam_edge@224-tok_canny_edge@224-"
            "color_palette-sam_instance")
MOD21_OUT = ("caption-det-metadata-tok_rgb@224-tok_normal@224-tok_depth@224-tok_semseg@224-"
             "tok_clip@224-human_poses-tok_dinov2@224-tok_dinov2_global-tok_imagebind@224-"
             "tok_imagebind_global-tok_sam_edge@224-tok_canny_edge@224-color_palette-sam_instance")
SR_IN = ("caption-det-rgb@224-tok_rgb@224-tok_depth@224-tok_semseg@224-tok_normal@224-"
         "tok_clip@224-tok_rgb@448-tok_depth@448-tok_semseg@448-tok_normal@448-tok_clip@448")
SR_OUT = "tok_rgb@448-tok_depth@448-tok_semseg@448-tok_normal@448-tok_clip@448"

def w(rel, text):
    p = ROOT / rel
    p.parent.mkdir(parents=True, exist_ok=True)
    p.write_text(text.lstrip())
    print("wrote", p.relative_to(ROOT.parents[1]))

# ---------------------------------------------------------------- 4m models
def model_cfg(model, nio, bs, total, warmup, data_cfg, in_d, out_d, ref, extra=""):
    return f"""
# fourm_tpu equivalent of reference {ref}
run_name: auto
# Input & output
in_domains: {in_d}
out_domains: {out_d}
num_input_tokens: {nio}
num_target_tokens: {nio}
loss_type: mod
# Architecture
model: {model}
dtype: bfloat16
# text_tokenizer_path: path/to/text_tokenizer_4m_wordpiece_30k.json
# Train (token-budget schedule; LR = blr * global_bs / 256)
total_tokens: {total} # in billions
warmup_tokens: {warmup} # in billions
blr: 0.0001
min_lr: 0.
batch_size: {bs} # per chip
# Data
data_config: cfgs/default/4m/data/{data_cfg}
eval_freq: 1
fixed_eval: true
epoch_size: 10_000_000
# Saving
save_ckpt_freq: 1
output_dir: out/auto
{extra}"""

SIZES = {"b": ("fm_base_12e_12d_swiglu_nobias", 128),
         "l": ("fm_large_24e_24d_swiglu_nobias", 64),
         "xl": ("fm_xlarge_24e_24d_swiglu_nobias", 64)}
for s, (model, bs7) in SIZES.items():
    w(f"4m/models/main/4m-{s}_mod7_500b.yaml",
      model_cfg(model, 128, bs7, 500, 10, "cc12m/main/mix_mod7_all2all_rgb2all_a0.5.yaml",
                MOD7_IN, MOD7_OUT, f"4m/models/main/4m-{s}_mod7_500b.yaml"))
    bs21 = {"b": 64, "l": 64, "xl": 32}[s]
    w(f"4m/models/main/4m-{s}_mod21_500b.yaml",
      model_cfg(model, 256, bs21, 500, 10,
                "cc12m+coyo+c4/main/mix_mod21_all2allmix_rgb2all_capT5bias_C4.yaml",
                MOD21_IN, MOD21_OUT, f"4m/models/main/4m-{s}_mod21_500b.yaml"))
for s in ("b", "l", "xl"):
    model = SIZES[s][0]
    w(f"4m/models/specialized/4m-{s}_mod7_500b--spec_text2im_100b.yaml",
      model_cfg(model, 256, 128 if s == "b" else 64, 100, 10,
                "cc12m/specialized/mix_caption_bias_a0.2_a1.0.yaml",
                "caption-t5_caption", "tok_rgb@224",
                f"4m/models/specialized/4m-{s}_mod7_500b--spec_text2im_100b.yaml",
                extra="# warm start from the 500b run:\n# finetune: out/4m-"
                      f"{s}_mod7_500b/weights\nfrozen_model_epochs: 0\n"))
w("4m/models/superres/4m-l_mod7_500b--sr_448_100b.yaml",
  model_cfg("fm_large_24e_24d_swiglu_nobias", 1024, 32, 100, 5,
            "cc12m/superres/mix_mod7_superres_caption_rgb_bias.yaml",
            SR_IN, SR_OUT, "4m/models/superres/4m-l_mod7_500b--sr_448_100b.yaml"))

# ---------------------------------------------------------------- alphas
def alphas_mod7(rgb2all=True):
    mods7 = ["tok_rgb@224", "tok_depth@224", "tok_semseg@224", "tok_normal@224", "tok_clip@224"]
    lines = ["# Mixture of Dirichlets: component 1 = rgb2all, component 2 = all2all (a=0.5)",
             "rgb@224:", "  input_alphas: [1000.0, 0.5]", "  target_alphas: [0., 0.]"]
    for m in mods7:
        lines += [f"{m}:", "  input_alphas: [0., 0.5]", "  target_alphas: [0.5, 0.5]"]
    for m in ("caption", "det"):
        lines += [f"{m}:", "  input_alphas: [0., 0.5]", "  target_alphas: [0.5, 0.5]",
                  "  keep: ['random', 'random']"]
    return "\n".join(lines) + "\n"
w("4m/alphas_mixture/main/mix_mod7_all2all_rgb2all_a0.5.yaml", alphas_mod7())

dense = ["tok_rgb@224", "tok_depth@224", "tok_semseg@224", "tok_normal@224"]
lines = ["# rgb2dense: RGB conditions, dense modalities are targets",
         "rgb@224:", "  input_alphas: [1000.0, 0.5]", "  target_alphas: [0., 0.]"]
for m in dense:
    lines += [f"{m}:", "  input_alphas: [0., 0.5]", "  target_alphas: [0.5, 0.5]"]
w("4m/alphas_mixture/main/mix_mod7_all2all_rgb2dense_a0.5.yaml", "\n".join(lines) + "\n")

lines = ["# caption-biased mixture (text2im specialization)",
         "sampling_weights: [0.7, 0.3]", "alphas_mixture:",
         "  caption:", "    input_alphas: [1000.0, 0.2]", "    target_alphas: [0., 1.0]",
         "    keep: ['all', 'random']",
         "  t5_caption:", "    input_alphas: [1000.0, 0.2]", "    target_alphas: [0., 0.]",
         "    keep: ['all', 'random']",
         "  tok_rgb@224:", "    input_alphas: [0., 0.2]", "    target_alphas: [1000.0, 1.0]"]
w("4m/alphas_mixture/specialized/mix_caption_bias_a0.2_a1.0.yaml", "\n".join(lines) + "\n")

mods21_toks = ["tok_rgb@224", "tok_normal@224", "tok_depth@224", "tok_semseg@224",
               "tok_clip@224", "tok_dinov2@224", "tok_dinov2_global", "tok_imagebind@224",
               "tok_imagebind_global", "tok_sam_edge@224", "tok_canny_edge@224"]
lines = ["# mod21 all2all mix with rgb2all + T5-caption bias components",
         "rgb@224:", "  input_alphas: [1000.0, 0.5, 0.]", "  target_alphas: [0., 0., 0.]"]
for m in mods21_toks:
    lines += [f"{m}:", "  input_alphas: [0., 0.5, 0.5]", "  target_alphas: [0.5, 0.5, 0.5]"]
for m in ("caption", "det", "metadata", "human_poses", "color_palette", "sam_instance"):
    lines += [f"{m}:", "  input_alphas: [0., 0.5, 0.5]", "  target_alphas: [0.5, 0.5, 0.5]",
              "  keep: ['random', 'random', 'random']"]
lines += ["t5_caption:", "  input_alphas: [0., 0.5, 1000.0]", "  target_alphas: [0., 0., 0.]",
          "  keep: ['random', 'random', 'all']"]
w("4m/alphas_mixture/main/mix_mod21_all2allmix_rgb2all_capT5bias.yaml", "\n".join(lines) + "\n")

lines = ["# super-resolution: 224 tokens + caption condition, 448 tokens target",
         "caption:", "  input_alphas: [1000.0]", "  target_alphas: [0.]", "  keep: ['all']",
         "det:", "  input_alphas: [0.5]", "  target_alphas: [0.]", "  keep: ['random']",
         "rgb@224:", "  input_alphas: [0.5]", "  target_alphas: [0.]"]
for m in ("tok_rgb", "tok_depth", "tok_semseg", "tok_normal", "tok_clip"):
    lines += [f"{m}@224:", "  input_alphas: [1000.0]", "  target_alphas: [0.]"]
    lines += [f"{m}@448:", "  input_alphas: [0.]", "  target_alphas: [1000.0]"]
w("4m/alphas_mixture/superres/mix_mod7_superres_caption_rgb_bias.yaml", "\n".join(lines) + "\n")

# ---------------------------------------------------------------- 4m data
def data_cfg(in_d, out_d, alphas, ref, extra_ds=""):
    return f"""
# fourm_tpu equivalent of reference {ref}
train:
  datasets:
    cc12m:
      type: multimodal
      in_domains: {in_d}
      out_domains: {out_d}
      input_alphas: null
      target_alphas: null
      alphas_config: cfgs/default/4m/alphas_mixture/{alphas}
      data_path: /path/to/training/data # folder root, or tar shards with use_wds
      use_wds: false
      wds_shuffle_buffer_tar: 1_000
      main_augment_domain: rgb@224
      aligned_captions: true
      tok_train_aug: true
      weight: 1.0
{extra_ds}
val:
  datasets:
    cc12m:
      type: multimodal
      in_domains: {in_d}
      out_domains: {out_d}
      alphas_config: cfgs/default/4m/alphas_mixture/{alphas}
      data_path: /path/to/val/data
"""
w("4m/data/cc12m/main/mix_mod7_all2all_rgb2all_a0.5.yaml",
  data_cfg(MOD7_IN, MOD7_OUT, "main/mix_mod7_all2all_rgb2all_a0.5.yaml",
           "4m/data/cc12m/main/mix_mod7_all2all_rgb2all_a0.5.yaml"))
w("4m/data/cc12m/main/mix_mod7_all2all_rgb2dense_a0.5.yaml",
  data_cfg("rgb@224-tok_rgb@224-tok_depth@224-tok_semseg@224-tok_normal@224",
           "tok_rgb@224-tok_depth@224-tok_semseg@224-tok_normal@224",
           "main/mix_mod7_all2all_rgb2dense_a0.5.yaml",
           "4m/data/cc12m/main/mix_mod7_all2all_rgb2dense_a0.5.yaml"))
w("4m/data/cc12m/specialized/mix_caption_bias_a0.2_a1.0.yaml",
  data_cfg("caption-t5_caption-tok_rgb@224", "tok_rgb@224",
           "specialized/mix_caption_bias_a0.2_a1.0.yaml",
           "4m/data/cc12m/specialized/mix_caption_bias_a0.2_a1.0.yaml"))
w("4m/data/cc12m/superres/mix_mod7_superres_caption_rgb_bias.yaml",
  data_cfg(SR_IN, SR_OUT, "superres/mix_mod7_superres_caption_rgb_bias.yaml",
           "4m/data/cc12m/superres/mix_mod7_superres_caption_rgb_bias.yaml"))
w("4m/data/cc12m+coyo+c4/main/mix_mod21_all2allmix_rgb2all_capT5bias_C4.yaml",
  data_cfg(MOD21_IN, MOD21_OUT, "main/mix_mod21_all2allmix_rgb2all_capT5bias.yaml",
           "4m/data/cc12m+coyo+c4/main/mix_mod21_all2allmix_rgb2all_capT5bias_C4.yaml"))

# ------------------------------------------------------------- tokenization
def vqvae_cfg(domain, enc, dec, K, res, ref, loss="mse", n_labels=None, latent=32,
              extra="", model_type="vqvae", n_channels=None, patch_proj=True):
    lines = [f"# fourm_tpu equivalent of reference {ref}",
             f"model_type: {model_type}",
             f"domain: {domain}", f"input_size: {res}",
             f"enc_type: {enc}", f"dec_type: {dec}", "patch_size: 16",
             "post_mlp: true",
             f"codebook_size: {K}", f"latent_dim: {latent}", "norm_codes: true",
             "ema_decay: 0.99", "threshold_ema_dead_code: 0.25",
             "code_replacement_policy: batch_random", "commitment_weight: 1.0",
             f"loss_fn: {loss}", "codebook_weight: 1.0",
             "dtype: bfloat16", "blr: 0.0001", "batch_size: 64",
             "total_steps: 200_000", "warmup_steps: 10_000",
             "clip_grad: 1.0", "model_ema: true", "model_ema_decay: 0.9999",
             "eval_freq: 5000", "save_ckpt_freq: 5000",
             "data_path: /path/to/dataset", "output_dir: out/auto"]
    if n_labels: lines.append(f"n_labels: {n_labels}")
    if n_channels: lines.append(f"n_channels: {n_channels}")
    if not patch_proj: lines.append("patch_proj: false")
    if extra: lines.append(extra.strip())
    return "\n".join(lines) + "\n"

for res, suffix in ((224, "224"), (448, "224-448")):
    w(f"tokenization/vqvae/CLIP-B16/ViTB-ViTB_8k_{suffix}.yaml",
      vqvae_cfg("CLIP-B16", "vit_b_enc", "vit_b_dec", 8192, res,
                f"tokenization/vqvae/CLIP-B16/ViTB-ViTB_8k_{suffix}.yaml",
                loss="cosine", n_channels=512, patch_proj=False))
    w(f"tokenization/vqvae/DINOv2-B14/ViTB-ViTB_8k_{suffix}.yaml",
      vqvae_cfg("DINOv2-B14", "vit_b_enc", "vit_b_dec", 8192, res,
                f"tokenization/vqvae/DINOv2-B14/ViTB-ViTB_8k_{suffix}.yaml",
                loss="cosine", n_channels=768, patch_proj=False))
    w(f"tokenization/vqvae/ImageBind-H14/ViTB-ViTB_8k_{suffix}.yaml",
      vqvae_cfg("ImageBind-H14", "vit_b_enc", "vit_b_dec", 8192, res,
                f"tokenization/vqvae/ImageBind-H14/ViTB-ViTB_8k_{suffix}.yaml",
                loss="cosine", n_channels=1280, patch_proj=False))
    w(f"tokenization/vqvae/DINOv2-B14-global/BMLP1024-BMLP1024_8k_{suffix}.yaml",
      vqvae_cfg("DINOv2-B14-global", "BottleneckMLP/B_6-Wi_1024", "BottleneckMLP/B_6-Wi_1024",
                8192, res,
                f"tokenization/vqvae/DINOv2-B14-global/BMLP1024-BMLP1024_8k_{suffix}.yaml",
                loss="cosine", n_channels=768))
    w(f"tokenization/vqvae/ImageBind-H14-global/BMLP1024-BMLP1024_8k_{suffix}.yaml",
      vqvae_cfg("ImageBind-H14-global", "BottleneckMLP/B_6-Wi_1024", "BottleneckMLP/B_6-Wi_1024",
                8192, res,
                f"tokenization/vqvae/ImageBind-H14-global/BMLP1024-BMLP1024_8k_{suffix}.yaml",
                loss="cosine", n_channels=1280))
    w(f"tokenization/vqvae/semseg_coco/ViTB-ViTB_4k_{suffix}.yaml",
      vqvae_cfg("semseg_coco", "vit_b_enc", "vit_b_dec", 4096, res,
                f"tokenization/vqvae/semseg_coco/ViTB-ViTB_4k_{suffix}.yaml",
                loss="cross_entropy", n_labels=134))
    w(f"tokenization/vqvae/rgb/ViTB-ViTB_1k_{suffix}_CLIPB16-5.0.yaml",
      vqvae_cfg("rgb", "vit_b_enc", "vit_b_dec", 1024, res,
                f"tokenization/vqvae/rgb/ViTB-ViTB_1k_{suffix}_CLIPB16-5.0.yaml",
                extra="percept_loss_weight: 5.0\n# percept_loss_ckpt: /path/to/lpips.safetensors"))
w("tokenization/vqvae/human_poses/BMLP1024-BMLP1024_1k_224.yaml",
  vqvae_cfg("human_poses", "BottleneckMLP/B_6-Wi_1024", "BottleneckMLP/B_6-Wi_1024", 1024, 224,
            "tokenization/vqvae/human_poses/BMLP1024-BMLP1024_1k_224.yaml",
            loss="mse", n_channels=207))
w("tokenization/vqvae/sam_instance/ViTB-ViTB_1k_224_64.yaml",
  vqvae_cfg("sam_instance", "vit_b_enc", "vit_b_dec", 1024, 64,
            "tokenization/vqvae/sam_instance/ViTB-ViTB_1k_224_64.yaml",
            loss="binary", n_channels=1))

def divae_cfg(domain, K, res, ref, pred="sample", beta="linear", dec="unet_patched",
              extra=""):
    base = vqvae_cfg(domain, "vit_b_enc", dec, K, res, ref, model_type="divae")
    return base + (f"num_train_timesteps: 1000\nprediction_type: {pred}\n"
                   f"beta_schedule: {beta}\nzero_terminal_snr: false\n"
                   "cls_free_guidance_dropout: 0.0\n") + extra

for res, suffix in ((224, "224"), (448, "224-448")):
    w(f"tokenization/divae/rgb/ViTB-UNetP4_16k_{suffix}_predx0.yaml",
      divae_cfg("rgb", 16384, res, f"tokenization/divae/rgb/ViTB-UNetP4_16k_{suffix}_predx0.yaml"))
    w(f"tokenization/divae/depth/ViTB-UNetP4_8k_{suffix}_predx0.yaml",
      divae_cfg("depth", 8192, res, f"tokenization/divae/depth/ViTB-UNetP4_8k_{suffix}_predx0.yaml"))
    w(f"tokenization/divae/normal/ViTB-UNetP4_8k_{suffix}_predx0.yaml",
      divae_cfg("normal", 8192, res, f"tokenization/divae/normal/ViTB-UNetP4_8k_{suffix}_predx0.yaml"))
    w(f"tokenization/divae/canny_edge/ViTB-UNetP4_8k_{suffix}_predx0.yaml",
      divae_cfg("canny_edge", 8192, res, f"tokenization/divae/canny_edge/ViTB-UNetP4_8k_{suffix}_predx0.yaml"))
    w(f"tokenization/divae/rgb/ViTB-UViTB_1k_{suffix}_predv_frozenenc.yaml",
      divae_cfg("rgb", 1024, res,
                f"tokenization/divae/rgb/ViTB-UViTB_1k_{suffix}_predv_frozenenc.yaml",
                pred="v_prediction", beta="squaredcos_cap_v2", dec="uvit_b_p4_f16",
                extra="zero_terminal_snr: true\nfreeze_enc: true\n"))
    w(f"tokenization/vqcontrolnet/rgb/ViTB-SD1.5_1k_{suffix}.yaml", f"""
# fourm_tpu equivalent of reference tokenization/vqcontrolnet/rgb/ViTB-SD1.5_1k_{suffix}.yaml
domain: rgb
input_size: {res}
enc_type: vit_b_enc
patch_size: 16
codebook_size: 1024
latent_dim: 32
freeze_enc: true
# SD 1.5-scale decoder (shrink for debugging)
model_channels: 320
num_res_blocks: 2
channel_mult: [1, 2, 4, 4]
attention_levels: [0, 1, 2]
num_heads: 8
vae_base_channels: 128
vae_ch_mult: [1, 2, 4, 4]
init_controlnet_from_unet: true
num_train_timesteps: 1000
prediction_type: epsilon
cls_free_guidance_dropout: 0.05
blr: 0.0001
batch_size: 32
total_steps: 200_000
warmup_steps: 10_000
dtype: bfloat16
data_path: /path/to/dataset
output_dir: out/auto
""")

# ------------------------------------------------------------- generation
for fm, sr in [("4m-b_mod7", "4m-l_mod7"), ("4m-b_mod21", "4m-l_mod7"),
               ("4m-l_mod7", "4m-l_mod7"), ("4m-l_mod21", "4m-l_mod7"),
               ("4m-xl_mod7", "4m-l_mod7"), ("4m-xl_mod21", "4m-l_mod7")]:
    w(f"generation/models/{fm}+sr_{sr}.yaml", f"""
# fourm_tpu equivalent of reference generation/models/{fm}+sr_{sr}.yaml
# checkpoints: released .safetensors or a train_4m output dir (config.json + weights/)
fm_ckpt: /path/to/{fm}.safetensors
fm_sr_ckpt: /path/to/sr_{sr}_448.safetensors
text_tokenizer_path: /path/to/text_tokenizer_4m_wordpiece_30k.json
detokenizer_steps: 50
tokenizer:
  - tok_rgb=/path/to/4M_tokenizers_rgb_16k_224-448.safetensors
  - tok_depth=/path/to/4M_tokenizers_depth_8k_224-448.safetensors
  - tok_normal=/path/to/4M_tokenizers_normal_8k_224-448.safetensors
  - tok_semseg=/path/to/4M_tokenizers_semseg_4k_224-448.safetensors
  - tok_clip=/path/to/4M_tokenizers_CLIP-B16_8k_224-448.safetensors
output_dir: out/auto
""")
w("generation/data/parti_3x.yaml", """
# reference generation/data/parti_3x.yaml
dataset: prompts
prompts_tsv: /path/to/PartiPrompts.tsv
num_samples: 1633
num_variations: 3
""")
w("generation/data/coco_30k.yaml", """
# reference generation/data/coco_30k.yaml
dataset: folder
data_path: /path/to/coco/val
num_samples: 30000
num_variations: 1
""")
w("generation/data/cc12m_30k.yaml", """
# reference generation/data/cc12m_30k.yaml
dataset: folder
data_path: /path/to/cc12m/val
num_samples: 30000
num_variations: 1
""")
w("generation/settings_base/T2CR_roar49-25_cfg3_t6-0.5.yaml", """
# reference generation/settings_base/T2CR_roar49-25_cfg3_t6-0.5.yaml
# consumed by api.FourMSampler.build_schedule overrides
cond_domains: caption
target_domains: tok_clip@224-tok_rgb@224
tokens_per_target: 196
autoregression_schemes: roar-roar
decoding_steps: 49-25
token_decoding_schedules: linear
temps: 6.0-0.5
temp_schedules: onex:0.5:0.5-constant
cfg_scales: 3.0
cfg_schedules: constant
cfg_grow_conditioning: true
top_p: 0.9
top_k: 0.0
""")
w("generation/settings_sr/x2CR_mg8_cfg3_t1const.yaml", """
# reference generation/settings_sr/x2CR_mg8_cfg3_t1const.yaml
cond_domains: tok_clip@224-tok_rgb@224-caption
target_domains: tok_clip@448-tok_rgb@448
tokens_per_target: 784
autoregression_schemes: maskgit-maskgit
decoding_steps: 8-8
token_decoding_schedules: cosine
temps: 1.0-1.0
temp_schedules: constant
cfg_scales: 3.0-3.0
cfg_schedules: constant
cfg_grow_conditioning: true
top_p: 0.9
top_k: 0.0
""")
print("done")
