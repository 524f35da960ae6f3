from .build_loader import build_dataloader, DataLoader

__all__ = ["build_dataloader", "DataLoader"]
