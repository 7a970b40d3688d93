from turkish_asr_tpu.serve.server import ServerConfig, ASRService, run_server

__all__ = ["ServerConfig", "ASRService", "run_server"]
