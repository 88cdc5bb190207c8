#!/usr/bin/env bash
# Model-zoo acquisition (SURVEY L10; reference: download.sh +
# download_bashscripts/*). Fetches the same checkpoints the reference uses
# into the models/ layout this framework's configs expect.
#
# Requires: huggingface-cli (pip install -U "huggingface_hub[cli]") and wget.
set -euo pipefail

mkdir -p models/{StableDiffusion,VAE,DreamBooth_LoRA,Motion_Module,ControlNet,IP-Adapter,TI,Upscalers,annotators}

echo ">> Stable Diffusion v1.5 base"
huggingface-cli download botp/stable-diffusion-v1-5 \
  --include "tokenizer/*" "text_encoder/*" "vae/*" "unet/*" "*.json" \
  --local-dir models/StableDiffusion/stable-diffusion-v1-5

echo ">> LCM Dreamshaper v7 (native-LCM UNet)"
huggingface-cli download SimianLuo/LCM_Dreamshaper_v7 \
  --include "unet/*" "*.json" \
  --local-dir models/LCM_Dreamshaper_v7

echo ">> VAE (ft-mse-840000)"
wget -nc -O models/VAE/vae-ft-mse-840000-ema-pruned.ckpt \
  "https://huggingface.co/stabilityai/sd-vae-ft-mse-original/resolve/main/vae-ft-mse-840000-ema-pruned.ckpt"

echo ">> AnimateDiff motion modules (v1 + v2)"
wget -nc -O models/Motion_Module/mm_sd_v15.ckpt \
  "https://huggingface.co/guoyww/animatediff/resolve/main/mm_sd_v15.ckpt"
wget -nc -O models/Motion_Module/mm_sd_v15_v2.ckpt \
  "https://huggingface.co/guoyww/animatediff/resolve/main/mm_sd_v15_v2.ckpt"

echo ">> DreamBooth base (dreamshaper_8) + LCM-LoRA"
wget -nc -O models/DreamBooth_LoRA/dreamshaper_8.safetensors \
  "https://civitai.com/api/download/models/128713" || \
  echo "   (dreamshaper_8 download requires a civitai token; place it manually)"
wget -nc -O models/DreamBooth_LoRA/lcm_lora.safetensors \
  "https://huggingface.co/latent-consistency/lcm-lora-sdv1-5/resolve/main/pytorch_lora_weights.safetensors"

echo ">> ControlNets"
for cn in control_v11p_sd15_openpose control_v11p_sd15_lineart \
          control_v11p_sd15_mlsd control_v11p_sd15_softedge \
          control_v11p_sd15s2_lineart_anime; do
  huggingface-cli download "lllyasviel/${cn}" \
    --include "diffusion_pytorch_model.safetensors" "config.json" \
    --local-dir "models/ControlNet/${cn}"
done
for cn in sd-controlnet-canny sd-controlnet-hed sd-controlnet-mlsd sd-controlnet-openpose; do
  huggingface-cli download "lllyasviel/${cn}" \
    --include "diffusion_pytorch_model.safetensors" "config.json" \
    --local-dir "models/ControlNet/${cn}"
done

echo ">> IP-Adapter (sd15 + CLIP ViT-H image encoder)"
huggingface-cli download h94/IP-Adapter \
  --include "models/ip-adapter_sd15.bin" "models/image_encoder/*" \
  --local-dir models/IP-Adapter

echo ">> Textual inversion (easynegative)"
wget -nc -O models/TI/easynegative.safetensors \
  "https://huggingface.co/datasets/gsdf/EasyNegative/resolve/main/EasyNegative.safetensors"

echo ">> Upscalers (RealESRGAN anime 6B + GFPGAN v1.3)"
wget -nc -O models/Upscalers/RealESRGAN_x4plus_anime_6B.pth \
  "https://github.com/xinntao/Real-ESRGAN/releases/download/v0.2.2.4/RealESRGAN_x4plus_anime_6B.pth"
wget -nc -O models/Upscalers/GFPGANv1.3.pth \
  "https://github.com/TencentARC/GFPGAN/releases/download/v1.0.8/GFPGANv1.3.pth"

echo ">> Annotator weights (controlnet_aux zoo)"
AX="https://huggingface.co/lllyasviel/Annotators/resolve/main"
wget -nc -O models/annotators/ControlNetHED.pth        "${AX}/ControlNetHED.pth"
wget -nc -O models/annotators/sk_model.pth             "${AX}/sk_model.pth"
wget -nc -O models/annotators/netG.pth                 "${AX}/netG.pth"
wget -nc -O models/annotators/table5_pidinet.pth       "${AX}/table5_pidinet.pth"
wget -nc -O models/annotators/body_pose_model.pth      "${AX}/body_pose_model.pth"
wget -nc -O models/annotators/hand_pose_model.pth      "${AX}/hand_pose_model.pth"
wget -nc -O models/annotators/facenet.pth              "${AX}/facenet.pth"
wget -nc -O models/annotators/mlsd_large_512_fp32.pth  "${AX}/mlsd_large_512_fp32.pth"
echo ">> depth model (DPT hybrid)"
huggingface-cli download Intel/dpt-hybrid-midas \
  --local-dir models/annotators/depth

echo "Done. Run: python main.py --config configs/prompts/SampleConfig.yaml"
