from .app import main

if __name__ == "__main__":  # not on accidental import of the module
    main()
