"""OpenAI-compatible serving with image inputs.

Server:  vllm-metax-tpu serve --model /path/to/Qwen2.5-VL --port 8000
"""

import base64
import json
import urllib.request

with open("scene.jpg", "rb") as f:
    b64 = base64.b64encode(f.read()).decode()

body = {
    "messages": [{
        "role": "user",
        "content": [
            {"type": "text", "text": "What is in this image?"},
            {"type": "image_url",
             "image_url": {"url": f"data:image/jpeg;base64,{b64}"}},
        ],
    }],
    "max_tokens": 128,
}
req = urllib.request.Request(
    "http://localhost:8000/v1/chat/completions",
    data=json.dumps(body).encode(),
    headers={"Content-Type": "application/json"},
)
print(json.load(urllib.request.urlopen(req))["choices"][0]["message"]["content"])
