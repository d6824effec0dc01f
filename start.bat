@echo off
REM Operator launcher — Windows twin of start.sh (reference parity:
REM /root/reference/start.bat: compose up, wait, show status + URLs).

echo ========================================
echo Sistema de Classificacao de Imagens (TPU)
echo ========================================
echo.

echo Iniciando servicos com Docker...
docker-compose up -d
if errorlevel 1 (
    echo ERRO: docker-compose falhou. Docker Desktop esta rodando?
    exit /b 1
)

echo.
echo Aguardando servicos iniciarem...
timeout /t 10 /nobreak >nul

echo.
echo Verificando status dos servicos...
docker-compose ps

echo.
echo ========================================
echo Sistema iniciado com sucesso!
echo ========================================
echo.
echo Acesse:
echo - API: http://localhost:8000
echo - Documentacao: http://localhost:8000/docs
echo - Health Check: http://localhost:8000/health
echo - Metricas: http://localhost:8000/monitor/metrics
echo.
echo Para ver logs: docker-compose logs -f
echo Para parar: docker-compose down
