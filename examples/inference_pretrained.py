"""Pretrained-weights inference walkthrough (the inference.ipynb analogue).

Shows the full real-checkpoint path end to end. Requires a diffusers-layout
SD3 directory plus (optionally) a released TPDM TPM safetensors file — not
present in this environment, so the script validates its inputs and prints
what it would do when artifacts are missing.

    python examples/inference_pretrained.py \
        --pretrained models/stabilityai/stable-diffusion-3-medium-diffusers \
        --tpm checkpoint/sd3/model.safetensors \
        --prompt "a cat holding a paper that says hello world"
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--pretrained", required=True)
    p.add_argument("--tpm", default=None, help="TPM-only safetensors (agent_model. layout)")
    p.add_argument("--prompt", default="a serene mountain lake at dawn")
    p.add_argument("--negative_prompt", default="")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--max_steps", type=int, default=35)  # demo budget (gradio_sd3_inference.py:44)
    p.add_argument("--out", default="generated.png")
    args = p.parse_args()

    if not os.path.isdir(args.pretrained):
        print(
            f"pretrained directory {args.pretrained!r} not found.\n"
            "This script needs the SD3 checkpoint tree (transformer/, vae/, "
            "text_encoder*/, tokenizer*/). With it, the flow below runs "
            "unchanged; see serve.py --toy for a weights-free demo."
        )
        return 1

    import numpy as np

    from tpdm_tpu.pipeline.pipeline import load_pipeline_from_pretrained
    from tpdm_tpu.utils.tokenizer import CLIPTokenizer

    pipe = load_pipeline_from_pretrained(
        args.pretrained, tpm_checkpoint=args.tpm, load_text_encoders=True
    )

    # our own BPE tokenizer (or swap in transformers' CLIPTokenizer)
    tok = CLIPTokenizer.from_pretrained(
        os.path.join(args.pretrained, "tokenizer")
    )
    clip_ids = tok([args.prompt], max_length=77)["input_ids"]
    neg_ids = tok([args.negative_prompt], max_length=77)["input_ids"]

    from tpdm_tpu.utils.t5_tokenizer import T5Tokenizer

    t5_tok = T5Tokenizer.from_pretrained(os.path.join(args.pretrained, "tokenizer_3"))
    t5_ids = t5_tok(
        [args.prompt], padding="max_length", max_length=256, truncation=True,
        return_tensors="np",
    )["input_ids"]
    neg_t5 = t5_tok(
        [args.negative_prompt], padding="max_length", max_length=256,
        truncation=True, return_tensors="np",
    )["input_ids"]

    res = pipe.generate(
        clip_ids=clip_ids,
        t5_ids=t5_ids,
        negative_clip_ids=neg_ids,
        negative_t5_ids=neg_t5,
        predict=True,
        seed=args.seed,
        max_inference_steps=args.max_steps,
    )
    from PIL import Image

    Image.fromarray(res.images[0]).save(args.out)
    nfe = int(res.last_valid_index[0]) + 1
    print(f"saved {args.out}; inference steps: {nfe} / cap {args.max_steps}")
    print("sigma chain:", np.round(res.sigmas[0][: res.num_steps], 4).tolist())
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
