"""Guided decoding: choices, regex, JSON schema (analog of the reference's
structured-output surface)."""

from vllm_metax_tpu import LLM, SamplingParams

llm = LLM(model="/path/to/model")

print(llm.generate(
    ["Is the sky blue? Answer:"],
    SamplingParams(max_tokens=4, guided_choice=["yes", "no"]),
)[0].outputs[0].text)

print(llm.generate(
    ["A phone number: "],
    SamplingParams(max_tokens=16, guided_regex=r"\d{3}-\d{4}"),
)[0].outputs[0].text)

schema = {
    "type": "object",
    "properties": {"name": {"type": "string"}, "age": {"type": "integer"}},
    "required": ["name", "age"],
}
print(llm.generate(
    ["Give me a person as JSON: "],
    SamplingParams(max_tokens=64, guided_json=schema),
)[0].outputs[0].text)

g = """
root ::= ("yes" | "no") ", confidence " [0-9] "." [0-9] [0-9]
"""
print(llm.generate(
    ["Will it rain? "],
    SamplingParams(max_tokens=24, guided_grammar=g),
)[0].outputs[0].text)
