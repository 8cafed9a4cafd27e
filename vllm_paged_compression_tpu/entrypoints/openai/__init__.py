from .api_server import OpenAIServer, run_server, serve

__all__ = ["OpenAIServer", "run_server", "serve"]
