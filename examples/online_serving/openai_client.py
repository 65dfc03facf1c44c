"""Drive the OpenAI-compatible server (start it first:
  python -m vllm_metax_tpu serve --model /path/to/checkpoint --port 8000)."""

import json
import urllib.request

def post(path, body):
    req = urllib.request.Request(
        f"http://localhost:8000{path}", data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"})
    return json.loads(urllib.request.urlopen(req).read())

print(post("/v1/completions",
           {"prompt": "Hello", "max_tokens": 16, "temperature": 0.7}))
print(post("/v1/chat/completions",
           {"messages": [{"role": "user", "content": "Hi!"}],
            "max_tokens": 16}))
