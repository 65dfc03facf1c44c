"""Structured decoding: guided_choice, guided_regex, guided_json."""

from vllm_metax_tpu import LLM, SamplingParams

llm = LLM(model="/path/to/checkpoint")

# 1. choose from a fixed set
sp = SamplingParams(max_tokens=8, temperature=0.0,
                    guided_choice=["positive", "negative", "neutral"])
out = llm.generate(["Sentiment of 'I love this': "], sp)
print(out[0].outputs[0].text)  # one of the three choices

# 2. match a regex (e.g. a version string)
sp = SamplingParams(max_tokens=16, temperature=0.0,
                    guided_regex=r"v[0-9]+\.[0-9]+\.[0-9]+")
out = llm.generate(["The latest release is "], sp)
print(out[0].outputs[0].text)  # e.g. v1.2.3

# 3. conform to a JSON schema (also exposed on the server as
#    response_format={"type": "json_schema", ...})
schema = {
    "type": "object",
    "properties": {
        "name": {"type": "string"},
        "age": {"type": "integer"},
        "tags": {"type": "array", "items": {"type": "string"}},
    },
}
sp = SamplingParams(max_tokens=128, temperature=0.0, guided_json=schema)
out = llm.generate(["Describe a user as JSON: "], sp)
print(out[0].outputs[0].text)  # parses with json.loads, matches the schema
