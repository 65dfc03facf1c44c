"""Qwen-VL image + video inference (analog of the reference's multimodal
examples for its Qwen-VL forks)."""

import numpy as np
from PIL import Image

from vllm_metax_tpu import LLM, SamplingParams

llm = LLM(model="/path/to/Qwen2.5-VL-7B-Instruct")

# Raw images run through the checkpoint's HF image processor automatically.
image = Image.open("scene.jpg")
prompt = (
    "<|im_start|>user\n<|vision_start|><|image_pad|><|vision_end|>"
    "Describe the image.<|im_end|>\n<|im_start|>assistant\n"
)
out = llm.generate(
    [{"prompt": prompt, "multi_modal_data": {"image": image}}],
    SamplingParams(max_tokens=128, temperature=0.0),
)
print(out[0].outputs[0].text)

# Videos: preprocessed tensors (or raw frame arrays) with per-grid
# temporal spacing for Qwen2.5-VL.
frames = np.stack([np.asarray(Image.open(f"f{i}.jpg")) for i in range(8)])
out = llm.generate(
    [{
        "prompt": prompt.replace("image_pad", "video_pad"),
        "multi_modal_data": {"video": frames},
    }],
    SamplingParams(max_tokens=128, temperature=0.0),
)
print(out[0].outputs[0].text)
