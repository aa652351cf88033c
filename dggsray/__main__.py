from .cli import main_safe

if __name__ == "__main__":
    raise SystemExit(main_safe())
