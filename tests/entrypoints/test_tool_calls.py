"""Tool-call parsing + chat-template tool plumbing (reference analog:
vllm/entrypoints/openai/tool_parsers/ and chat_utils tool handling)."""

import json

from vllm_paged_compression_tpu.entrypoints.chat_utils import (
    apply_chat_template)
from vllm_paged_compression_tpu.entrypoints.openai.tool_parsers import (
    parse_tool_calls)

WEATHER_TOOL = {
    "type": "function",
    "function": {
        "name": "get_weather",
        "description": "Get the current weather",
        "parameters": {"type": "object",
                       "properties": {"city": {"type": "string"}},
                       "required": ["city"]}}}


class TestParsers:
    def test_hermes_single_call(self):
        text = ('Let me check.\n<tool_call>\n{"name": "get_weather", '
                '"arguments": {"city": "Paris"}}\n</tool_call>')
        content, calls = parse_tool_calls(text, "hermes")
        assert content == "Let me check."
        assert len(calls) == 1
        assert calls[0]["type"] == "function"
        assert calls[0]["function"]["name"] == "get_weather"
        assert json.loads(calls[0]["function"]["arguments"]) == {
            "city": "Paris"}

    def test_hermes_multiple_calls(self):
        text = ('<tool_call>{"name": "a", "arguments": {}}</tool_call>'
                '<tool_call>{"name": "b", "arguments": {"x": 1}}</tool_call>')
        _, calls = parse_tool_calls(text, "hermes")
        assert [c["function"]["name"] for c in calls] == ["a", "b"]

    def test_json_bare_object(self):
        text = '{"name": "get_weather", "parameters": {"city": "Tokyo"}}'
        content, calls = parse_tool_calls(text, "json")
        assert content == ""
        assert calls[0]["function"]["name"] == "get_weather"
        assert json.loads(calls[0]["function"]["arguments"]) == {
            "city": "Tokyo"}

    def test_json_array_and_mistral_prefix(self):
        text = ('[TOOL_CALLS][{"name": "a", "arguments": {}}, '
                '{"name": "b", "arguments": {"y": 2}}]')
        _, calls = parse_tool_calls(text, "json")
        assert [c["function"]["name"] for c in calls] == ["a", "b"]

    def test_plain_text_passthrough(self):
        for parser in ("auto", "hermes", "json"):
            content, calls = parse_tool_calls("It is sunny today.", parser)
            assert content == "It is sunny today."
            assert calls == []

    def test_auto_prefers_hermes_tags(self):
        text = '<tool_call>{"name": "a", "arguments": {}}</tool_call>'
        _, calls = parse_tool_calls(text, "auto")
        assert calls and calls[0]["function"]["name"] == "a"

    def test_malformed_json_is_not_a_call(self):
        content, calls = parse_tool_calls('{"name": broken', "auto")
        assert calls == [] and content == '{"name": broken'

    def test_call_ids_unique(self):
        text = ('<tool_call>{"name": "a", "arguments": {}}</tool_call>'
                '<tool_call>{"name": "a", "arguments": {}}</tool_call>')
        _, calls = parse_tool_calls(text, "hermes")
        assert calls[0]["id"] != calls[1]["id"]


class TestTemplateTools:
    def test_fallback_template_declares_tools(self):
        msgs = [{"role": "user", "content": "weather in Paris?"}]
        out = apply_chat_template(msgs, None, tools=[WEATHER_TOOL])
        assert "get_weather" in out
        assert "<tool_call>" in out          # convention explained
        assert "weather in Paris?" in out

    def test_fallback_template_renders_tool_turns(self):
        msgs = [
            {"role": "user", "content": "weather?"},
            {"role": "assistant", "content": None, "tool_calls": [
                {"id": "t1", "type": "function",
                 "function": {"name": "get_weather",
                              "arguments": '{"city": "Paris"}'}}]},
            {"role": "tool", "content": '{"temp_c": 21}'},
        ]
        out = apply_chat_template(msgs, None, tools=[WEATHER_TOOL])
        assert '"city": "Paris"' in out
        assert '{"temp_c": 21}' in out

    def test_jinja_template_receives_tools(self):
        tpl = ("{% if tools %}TOOLS:{% for t in tools %}"
               "{{ t.function.name }}{% endfor %}{% endif %}"
               "{% for m in messages %}[{{ m.role }}]{{ m.content }}"
               "{% endfor %}")
        out = apply_chat_template([{"role": "user", "content": "hi"}],
                                  tpl, tools=[WEATHER_TOOL])
        assert out == "TOOLS:get_weather[user]hi"


class TestServerResponse:
    def _server(self):
        from vllm_paged_compression_tpu.entrypoints.openai.api_server import (
            OpenAIServer)
        return OpenAIServer(async_engine=None, model_name="tiny")

    def _out(self, text):
        class CO:
            token_ids = [1, 2]
            finish_reason = "stop"
        CO.text = text

        class Out:
            prompt_token_ids = [1, 2, 3]
            outputs = [CO()]
        return Out()

    def test_tool_call_response_shape(self):
        srv = self._server()
        text = '<tool_call>{"name": "f", "arguments": {"a": 1}}</tool_call>'
        resp = srv._response_json("id", 0, "chat.completion",
                                  self._out(text), chat=True,
                                  parse_tools=True)
        choice = resp["choices"][0]
        assert choice["finish_reason"] == "tool_calls"
        msg = choice["message"]
        assert msg["content"] is None
        assert msg["tool_calls"][0]["function"]["name"] == "f"

    def test_no_tools_means_plain_content(self):
        srv = self._server()
        resp = srv._response_json("id", 0, "chat.completion",
                                  self._out("hello"), chat=True,
                                  parse_tools=False)
        msg = resp["choices"][0]["message"]
        assert msg["content"] == "hello" and "tool_calls" not in msg
